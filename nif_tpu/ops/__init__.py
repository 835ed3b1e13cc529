from .shapenet import shapenet_grouped, shapenet_pointwise, unpack_shapenet_weights

__all__ = [
    "shapenet_pointwise",
    "shapenet_grouped",
    "unpack_shapenet_weights",
]
