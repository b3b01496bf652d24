from .scalekd import (  # noqa: F401
    AttentionProjector,
    FFN,
    ScaleKD,
    WindowMultiheadPosAttention,
    frequency_loss_fn,
    spatial_loss_fn,
)

LOSS_REGISTRY = {"scalekd": ScaleKD}
