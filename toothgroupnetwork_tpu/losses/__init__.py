"""Loss library: semantic CE, centroid-offset/chamfer (tgnet), tsegnet losses, CBL."""

from .seg_loss import tooth_class_loss, feature_transform_regularizer

__all__ = ["tooth_class_loss", "feature_transform_regularizer"]
