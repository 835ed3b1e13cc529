from .point_wise_data import PointWiseData

__all__ = ["PointWiseData"]
