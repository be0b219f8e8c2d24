from .base import LinearSolver, SolveStats, norm
from .krylov import CG, BiCGStab, GMRES, JacobiSolver
from .amg import AMG, DirectSolver
from .ilu import ILU0Solver
from .spike import SpikeSolver
from .coupled import CoupledSIMPLE
