from .logger import Logger
from .tb_writer import TBWriter, Visualizer
from . import dump_helper, metrics
