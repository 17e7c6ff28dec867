from .ast import ASTConfig, ASTModel  # noqa: F401
from .beats import BEATsConfig, BEATsEncoder, BEATsModel, BEATsTransformer  # noqa: F401
from .cnn import CNN, GLU, ContextGating  # noqa: F401
from .crnn import CRNN  # noqa: F401
from .ensemble import EnsembleModel  # noqa: F401
from .panns import Cnn14_16k  # noqa: F401
from .rnn import BidirectionalGRU, BidirectionalLSTM  # noqa: F401
