from s4former_tpu.data.datasets.custom import (  # noqa: F401
    ADE20KDataset, CityscapesDataset, CustomDataset, PascalVOCDataset,
    SemiDataset, build_dataset)
