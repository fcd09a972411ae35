from .checker import ConstraintError, check
from .context import Cell, Context
