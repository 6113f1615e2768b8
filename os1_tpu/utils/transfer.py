"""Device->host transfer discipline for the tunneled-TPU transport.

Measured transport semantics (probe, round 4): a d2h GET issued after more
work has been enqueued is serviced only when the device queue drains — a
cold ``device_get`` behind queued programs can wait for ALL of them (seconds
under load), while ``copy_to_host_async`` issued at dispatch time enqueues
the transfer in stream order and the later read completes in ~transfer time.

Rule: NEVER cold-call device_get/np.asarray on a device array after further
dispatches may have been enqueued. Call :func:`fetch` instead — it announces
the copy for every leaf first, then gathers.
"""
from __future__ import annotations

import jax


def announce(tree) -> None:
    """Start async d2h copies for every device-array leaf (no-op on host
    arrays). Call immediately after the producing dispatch."""
    for leaf in jax.tree.leaves(tree):
        try:
            leaf.copy_to_host_async()
        except AttributeError:
            pass


def fetch(tree):
    """announce + gather: the safe blocking device->host read. Single-leaf
    gathers per array (batched-tuple device_get has been observed to hang
    on this transport)."""
    announce(tree)
    return jax.tree.map(lambda leaf: jax.device_get(leaf), tree)
