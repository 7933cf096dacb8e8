from .mlp import MLP  # noqa: F401
from .rnn import RNN, LSTMCell, GRUCell  # noqa: F401
from .tcn import TemporalConvNet  # noqa: F401
from .video_state_net import VideoStateNet  # noqa: F401
