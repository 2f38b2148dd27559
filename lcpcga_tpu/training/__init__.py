from .loss import Loss, BPPLoss, ColorLoss, FocalLoss, MultiscaleFocalLoss

__all__ = ["Loss", "BPPLoss", "ColorLoss", "FocalLoss", "MultiscaleFocalLoss"]
