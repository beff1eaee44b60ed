from rag_tpu.utils.logging import MetricWriter
