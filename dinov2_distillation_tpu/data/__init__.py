from .augment import DataAugmentationDINO, RandAugment  # noqa: F401
from .dataset import ImageFolderDataset, SyntheticDataset, train_val_split  # noqa: F401
from .loader import DataLoader, build_loaders  # noqa: F401
