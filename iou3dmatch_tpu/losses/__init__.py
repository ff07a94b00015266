"""Loss functions: supervised (eval), labeled (train), unlabeled (SSL)."""
from .supervised import get_loss
from .labeled import get_labeled_loss
from .unlabeled import get_unlabeled_loss
from .iou_labels import compute_iou_labels

__all__ = ["get_loss", "get_labeled_loss", "get_unlabeled_loss", "compute_iou_labels"]
