from lwsnet_tpu.data.kitti2015 import (DEFAULT_VAL_FRAMES, StereoIndex,
                                       index_kitti2015,
                                       index_kitti2015_testing)
from lwsnet_tpu.data.pfm import read_pfm, write_pfm
from lwsnet_tpu.data.pipeline import Batch, StereoPipeline
from lwsnet_tpu.data.sceneflow import index_sceneflow
