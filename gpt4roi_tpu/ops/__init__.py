from gpt4roi_tpu.ops.interp import interpolate_bilinear, resize_matrix
from gpt4roi_tpu.ops.roi_align import roi_align, roi_align_matrices
from gpt4roi_tpu.ops.norms import group_norm, layer_norm, rms_norm
