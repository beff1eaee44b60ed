from rag_tpu.continual.driver import ContinualDriver, ExperimentConfig
