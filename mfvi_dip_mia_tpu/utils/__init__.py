from . import images
from . import config
