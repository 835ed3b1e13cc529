from .point_wise_data import PointWiseData
from .prefetch import prefetch_to_device
from .sharded_dataset import GroupedDataset, ShardedDataset

__all__ = [
    "PointWiseData",
    "ShardedDataset",
    "GroupedDataset",
    "prefetch_to_device",
]
