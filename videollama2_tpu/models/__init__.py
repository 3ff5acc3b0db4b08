"""Model registry.

Parity: reference videollama2/model/__init__.py:31-45 — the VLLMs /
VLLMConfigs name->class maps. Here model families are config presets over one
functional implementation set; `VLLMs[name]` yields the ModelConfig factory
and `load_pretrained_model` mirrors the reference loader entry.
"""

from ..core import config as _cfg

VLLMConfigs = {
    "videollama2": lambda: _cfg.preset("videollama2_mistral"),
    "videollama2_mistral": lambda: _cfg.preset("videollama2_mistral"),
    "videollama2_qwen2": lambda: _cfg.preset("videollama2_qwen2"),
    "videollama2_mixtral": lambda: _cfg.preset("videollama2_mixtral"),
    "videollama2_llama": lambda: _cfg.preset("videollama2_llama"),
}

VLLMs = VLLMConfigs  # the functional impl is shared; configs select family


def load_pretrained_model(model_path, model_base=None, model_name=None,
                          **kwargs):
    """Reference-signature loader (model/__init__.py:48-193).

    Returns (tokenizer, model, processor, context_len) in the reference's
    tuple order.
    """
    from ..inference.api import model_init
    model, processor, tokenizer = model_init(model_path,
                                             model_base=model_base, **kwargs)
    context_len = model.config.llm.max_position_embeddings
    return tokenizer, model, processor, context_len
