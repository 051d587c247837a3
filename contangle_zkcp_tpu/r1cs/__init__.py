from .builder import ConstraintSystem, LC
from .gadgets import Gadgets
