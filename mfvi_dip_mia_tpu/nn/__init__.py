from .skip import SkipNet, build_skip_net
from . import layers
from . import init
