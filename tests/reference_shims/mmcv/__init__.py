"""Minimal mmcv shim so the reference's model code (gpt4roi/models/
layers.py) can run unmodified on CPU for the end-to-end fidelity gate.

Implements exactly the symbols the reference imports, with mmcv-1.4.7
semantics (the pinned version in the reference's requirements):
``cnn.ConvModule`` (conv -> norm -> act, bias auto-disabled under norm,
norm attribute named by type so state_dict keys match, e.g. ``.gn``),
``cnn.Linear``, ``cnn.normal_init``, and ``ops.RoIAlign`` (aligned=True,
avg pool) as a from-spec separable-matmul CPU implementation (semantics:
mmcv/ops/csrc/common/cuda/roi_align_cuda_kernel.cuh:35-106).
"""

from tests.reference_shims.mmcv import cnn, ops  # noqa: F401
