from . import lr_scheduler, optimizer  # noqa: F401
from .lr_scheduler import (CosineAnnealingLR, ExpLR, InvLR,  # noqa: F401
                           PolyLR, StepLR, WarmUpLR, WarmUpLRGroup)
from .optimizer import SGD, Adam, AdamW, GradMutilpySGD  # noqa: F401
