from .fluent import read_fluent_mesh
