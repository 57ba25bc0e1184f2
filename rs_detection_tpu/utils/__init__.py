from .general import (build_file, check_interval, multi_apply,  # noqa: F401
                      parse_losses, search_ckpt, set_random_seed, unmap)
from .registry import (BACKBONES, BOXES, BRICKS, DATASETS,  # noqa: F401
                       HEADS, HOOKS, LOSSES, MODELS, NECKS, OPTIMS,
                       ROI_EXTRACTORS, SCHEDULERS, SHARED_HEADS,
                       TRANSFORMS, Registry, build_from_cfg)
