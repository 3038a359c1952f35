"""Detection losses."""

from .ron import RonLossConfig, ron_losses
from .ssd import SsdLossConfig, ssd_losses

__all__ = ["RonLossConfig", "ron_losses", "SsdLossConfig", "ssd_losses"]
