from .problems import build_problem, Problem
from .trainer import fit, Method, FitResult
from . import runners
