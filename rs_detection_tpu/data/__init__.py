"""Data layer: transforms, datasets, collate, devkits."""
from . import transforms  # noqa: F401
from .collate import collate_batch  # noqa: F401
from .custom import CustomDataset  # noqa: F401
from .dota import (DOTADataset, FAIR1M_1_5_Dataset, FAIRDataset,  # noqa: F401
                   SSDDDataset)
from .image import ImageDataset  # noqa: F401
from .scene import SceneDataset  # noqa: F401
from .yolo import COCODataset, YoloDataset  # noqa: F401
