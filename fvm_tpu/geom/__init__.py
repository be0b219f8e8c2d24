from .search import KSearchTree, Octree, AABB
from .ibm import IBManager, IBType
