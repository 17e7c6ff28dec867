from .cnn import CNN, GLU, ContextGating  # noqa: F401
from .crnn import CRNN  # noqa: F401
from .rnn import BidirectionalGRU, BidirectionalLSTM  # noqa: F401
