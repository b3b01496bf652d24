from .attention import fused_attention  # noqa: F401
from .dct import dct2, dct_matrix, idct2, idct_matrix, remove_dc_2d  # noqa: F401
from .resize import interpolate_pos_embed, resize_nhwc  # noqa: F401
