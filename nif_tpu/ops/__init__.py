from .derivatives import (
    jacobian_regularization,
    output_and_jacobian,
    output_jacobian_hessian,
    sobolev_loss,
)
from .shapenet import shapenet_grouped, shapenet_pointwise, unpack_shapenet_weights

__all__ = [
    "shapenet_pointwise",
    "shapenet_grouped",
    "unpack_shapenet_weights",
    "output_and_jacobian",
    "output_jacobian_hessian",
    "jacobian_regularization",
    "sobolev_loss",
]
