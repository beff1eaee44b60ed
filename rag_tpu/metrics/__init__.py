from rag_tpu.metrics.stereo import d1_metric, epe_metric, thres_metric, stereo_metrics
from rag_tpu.metrics.depth import depth_metrics
from rag_tpu.metrics.meters import AverageMeterDict, ForgettingMatrix
