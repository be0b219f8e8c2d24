from .connectivity import CRConnectivity
from .mesh import Mesh, FaceGroup
from .metrics import MeshGeometry, compute_geometry
from .device import DeviceMesh, build_device_mesh
from .assemble import merge_meshes, extract_region
from . import generate
