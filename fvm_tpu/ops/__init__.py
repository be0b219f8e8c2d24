from .ell import ELLMatrix, greedy_coloring
from .assembly import FaceFlux, assemble, face_values, cells_to_faces_distance_weighted
from .gradients import ls_gradient_coefficients, gradient
