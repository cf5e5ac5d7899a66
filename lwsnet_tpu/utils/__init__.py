from lwsnet_tpu.utils.colormap import colorize_disparity, jet_colormap
from lwsnet_tpu.utils.logger import setup_logger
