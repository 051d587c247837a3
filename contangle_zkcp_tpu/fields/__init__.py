from .fp import Fp
from .bigint import int_to_limbs, limbs_to_int, ints_to_limbs, limbs_to_ints, num_limbs
from . import instances
