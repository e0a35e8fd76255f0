"""Data pipeline: datasets, augmentations, prefetching loader, synthetic."""

from synergynet_tpu.data.datasets import FileListDataset, ArrayDataset  # noqa: F401
from synergynet_tpu.data.transforms import (  # noqa: F401
    ColorJitter, BorderOcclusion, TrainTransform, TestTransform,
    normalize_images,
)
from synergynet_tpu.data.loader import PrefetchLoader, shard_batches  # noqa: F401
from synergynet_tpu.data.synthetic import (  # noqa: F401
    GeneratedCropDataset, make_crops_with_params, make_synthetic_aflw2000,
    sample_params,
)
from synergynet_tpu.data.device_augment import device_augment  # noqa: F401
from synergynet_tpu.data.ingest import (  # noqa: F401
    load_aflw2000_dir, load_300wlp_dir, save_eval_pack,
)
