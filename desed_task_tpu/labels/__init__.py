from .encoder import CatManyHotEncoder, ManyHotEncoder  # noqa: F401
from .events import decode_strong_array, find_contiguous_regions  # noqa: F401
