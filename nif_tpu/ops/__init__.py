from .derivatives import (
    jacobian_regularization,
    output_and_jacobian,
    output_and_jacobian_grouped,
    output_jacobian_hessian,
    output_jacobian_hessian_grouped,
    sobolev_loss,
    sobolev_loss_grouped,
)
from .shapenet import shapenet_grouped, shapenet_pointwise, unpack_shapenet_weights

__all__ = [
    "shapenet_pointwise",
    "shapenet_grouped",
    "unpack_shapenet_weights",
    "output_and_jacobian",
    "output_and_jacobian_grouped",
    "output_jacobian_hessian",
    "output_jacobian_hessian_grouped",
    "jacobian_regularization",
    "sobolev_loss",
    "sobolev_loss_grouped",
]
