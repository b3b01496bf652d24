from .vit import DINOv2ViT, VIT_CONFIGS, ViTConfig, create_teacher  # noqa: F401
from .zoo import StudentWrapper, available_families, create_student, family_id  # noqa: F401
