"""videollama2_tpu — TPU-native rebuild of VideoLLaMA2.

Public API parity with the reference package (videollama2/__init__.py):
`model_init(model_path) -> (model, processor, tokenizer)` and
`mm_infer(tensor, instruct, model, tokenizer, modal, **kwargs) -> str`,
backed by a JAX/XLA/Pallas compute path instead of torch/CUDA.
"""

__version__ = "0.1.0"


def model_init(*args, **kwargs):
    from .inference.api import model_init as _mi
    return _mi(*args, **kwargs)


def mm_infer(*args, **kwargs):
    from .inference.api import mm_infer as _mm
    return _mm(*args, **kwargs)
