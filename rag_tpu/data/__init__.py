from rag_tpu.data.readers import read_pfm, read_png_disparity, read_image
from rag_tpu.data.stereo_dataset import StereoDataset, load_file_list
from rag_tpu.data.synthetic import synthetic_stereo_batch, SyntheticStereoDataset
