from lwsnet_tpu.ops import stereo
