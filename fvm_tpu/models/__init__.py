from .base import Model, ResidualHistory
from .thermal import ThermalModel, ThermalBC, ThermalVC, ThermalModelOptions
from .flow import FlowModel, FlowBC, FlowVC, FlowModelOptions
from .electric import ElectricModel, ElectricBC, ElectricVC
from .species import SpeciesModel, SpeciesBC, SpeciesVC
from .structure import StructureModel, StructureBC, StructureVC
from .vacancy import VacancyModel, VacancyBC, VacancyVC
from .fracture import FractureModel, FractureBC, FractureVC
from .squeeze_film import SqueezeFilmModel, SqueezeFilmBC, SqueezeFilmVC
from .property_models import IdealGasDensityModel, RosselandModel, IdealGasVC, RosselandVC
from .shocktube import ShockTube
from .onedconduction import OneDConduction
from .plate import PlateModel, PlateBC, PlateVC
from .ke import KeModel, KeBC, KeVC
from .battery import BatteryModel, BatteryBC, BatteryVC
from .motion import MovingMeshModel, StructureDeformationModel
from .contact import ContactModel, ContactVC
from .scalar_generic import GenericScalarModel
from .charging import DielectricChargingModel, DielectricChargingConstants
