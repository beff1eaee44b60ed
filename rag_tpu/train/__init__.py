from rag_tpu.train.losses import smooth_l1_masked, silog_loss, photometric_loss
