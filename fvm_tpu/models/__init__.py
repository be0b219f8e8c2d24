from .base import Model, ResidualHistory
from .thermal import ThermalModel, ThermalBC, ThermalVC, ThermalModelOptions
