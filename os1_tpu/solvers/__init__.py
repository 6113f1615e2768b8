from .initializer import InitResult, initialize_two_view  # noqa: F401
