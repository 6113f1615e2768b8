"""os1-tpu: a TPU-native monocular visual SLAM framework.

A from-scratch re-design of the capability set of the reference system
``AlejandroSilvestri/os1`` (an annotated ORB-SLAM2 fork in C++11) for TPU
hardware: batched ORB feature extraction, Hamming matching, two-view
initialization, tracking, local mapping with Schur-complement bundle
adjustment, BoW place recognition, Sim3 loop closing, and map persistence —
expressed as jitted XLA/Pallas device programs over fixed-shape masked
arrays instead of a mutex-guarded C++ object graph.

Layer map (mirrors reference layers, see SURVEY.md §1):
  pipeline/   System facade, Tracking FSM, LocalMapping, LoopClosing  (ref L3-L4)
  solvers/    two-view init, EPnP, Sim3 Horn RANSAC                    (ref L2)
  optim/      Levenberg-Marquardt, pose opt, Schur BA, pose graph      (ref g2o)
  features/   ORB pyramid extractor                                    (ref ORBextractor)
  matching/   Hamming matchers (projection / BoW / epipolar / fusion)  (ref ORBmatcher)
  vocab/      BoW vocabulary tree + inverted-file database             (ref DBoW2 + KeyFrameDatabase)
  map/        struct-of-arrays map store, covisibility                 (ref Map/KeyFrame/MapPoint)
  geometry/   SE3/Sim3, camera models, triangulation                   (ref Converter/g2o types)
  ops/        Pallas/XLA kernels (FAST, BRIEF, Hamming, top-k)
  parallel/   device meshes, sharded distributed BA
  io/         config, datasets, trajectory, Osmap-compatible persistence
  viz/        map/frame rendering, HUD
"""

__version__ = "0.1.0"

import jax as _jax

# Persistent XLA compilation cache: the pipeline's programs take minutes to
# compile and sub-milliseconds to run — cache them across processes (see
# utils/cache.py; disable with OS1_NO_COMPILATION_CACHE=1).
from .utils.cache import enable_compilation_cache as _enable_cache

_enable_cache()

# Geometry accuracy is the product: on TPU the default matmul precision runs
# f32 matmuls through bf16 passes, which measurably corrupts small-matrix
# geometry (triangulation error 6x worse, Sim3 exp/log roundtrip ~0.04
# instead of ~1e-4, observed on TPU v5e). Default the whole framework to
# true-f32 matmuls; throughput-critical kernels (Hamming popcount, BoW
# scoring, image convs) opt into lower precision explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "float32")
