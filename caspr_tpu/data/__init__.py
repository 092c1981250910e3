from .dataset import (
    DynamicPCLDataset,
    SequenceLoader,
    load_seq_path,
    load_time_data,
    parse_dataset_cfg,
    BAD_MODELS,
)
