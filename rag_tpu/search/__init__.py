from rag_tpu.search.genotype import Genotype, parse_genotype, default_genotype
