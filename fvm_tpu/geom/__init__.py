from .search import KSearchTree, Octree, AABB
from .ibm import IBManager, IBType
from .grid_interp import Grid
from .particles import ParticleTracker
