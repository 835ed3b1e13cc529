from .point_wise_data import PointWiseData
from .sharded_dataset import GroupedDataset, ShardedDataset

__all__ = ["PointWiseData", "ShardedDataset", "GroupedDataset"]
