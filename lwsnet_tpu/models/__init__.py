from lwsnet_tpu.models.lwsnet import LWSNet
from lwsnet_tpu.models.feature import FeatureExtractor, Hourglass
from lwsnet_tpu.models.refinement import RefinementHead, RefinementTower
