from rag_tpu.runtime.native import (
    native_available,
    read_png_native,
    read_pfm_native,
    NativeStereoLoader,
)
