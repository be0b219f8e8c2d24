from .fluent import read_fluent_mesh, read_fluent_meshes
from .exporters import write_tecplot, write_fluent_data
from .vtk import write_vtk
from .matrixmarket import read_matrix_market
from .persistence import Persistence
from .netcdf import write_netcdf, read_netcdf
