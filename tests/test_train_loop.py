"""End-to-end training-loop test: dataset json + media -> Trainer -> ckpt
-> resume. Exercises data masking, collation, sharded stepping, Orbax save,
and auto-resume (reference train.py:552-557 parity)."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Tiny media + annotations in the reference's dataset format."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    media = root / "media"
    media.mkdir()
    annos = []
    for i in range(4):
        frames = [Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                               dtype=np.uint8))
                  for _ in range(6)]
        gif = media / f"v{i}.gif"
        frames[0].save(gif, save_all=True, append_images=frames[1:],
                       duration=50)
        annos.append({
            "video": f"media/v{i}.gif",
            "conversations": [
                {"from": "human", "value": f"<video>\nwhat happens {i} ?"},
                {"from": "gpt", "value": "the cat jumps ."}]})
    for i in range(2):
        img = media / f"i{i}.png"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3),
                                     dtype=np.uint8)).save(img)
        annos.append({
            "image": f"media/i{i}.png",
            "conversations": [
                {"from": "human", "value": f"<image>\ndescribe {i}"},
                {"from": "gpt", "value": "a dog ."}]})
    annos.append({"conversations": [
        {"from": "human", "value": "say yes"},
        {"from": "gpt", "value": "yes ."}]})
    anno_path = root / "anno.json"
    with open(anno_path, "w") as f:
        json.dump(annos, f)
    return str(root), str(anno_path)


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from make_tiny_checkpoint import build_tokenizer
    d = str(tmp_path_factory.mktemp("tok"))
    build_tokenizer(d, 512)
    from transformers import AutoTokenizer
    return AutoTokenizer.from_pretrained(d)


def test_dataset_and_masking(corpus, tokenizer):
    from videollama2_tpu.constants import IGNORE_INDEX
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.train import data as data_lib

    root, anno = corpus
    cfg = cfglib.tiny_model()
    da = data_lib.DataArguments(data_path=[anno], data_folder=root,
                                is_pretraining=False)
    ds = data_lib.SupervisedDataset([anno], tokenizer, da, cfg)
    assert len(ds) == 7
    item = ds[0]
    assert item["frames"].shape[0] == cfg.num_frames
    labels = np.asarray(item["labels"])
    ids = np.asarray(item["input_ids"])
    # instruction tokens masked, answer supervised
    assert (labels == IGNORE_INDEX).any()
    assert (labels != IGNORE_INDEX).any()
    sup = labels[labels != IGNORE_INDEX]
    answer_ids = tokenizer("the cat jumps .",
                           add_special_tokens=False).input_ids
    assert set(answer_ids).issubset(set(sup.tolist()))
    # modality lengths: mm positive, text negative
    ml = ds.modality_lengths
    assert ml[0] > 0 and ml[-1] < 0


def test_trainer_runs_and_resumes(corpus, tokenizer, tmp_path):
    import jax
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.models import videollama2 as vl2
    from videollama2_tpu.train import data as data_lib
    from videollama2_tpu.train import optimizer as opt_lib
    from videollama2_tpu.train.trainer import Trainer, TrainerConfig

    root, anno = corpus
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg)
    da = data_lib.DataArguments(data_path=[anno], data_folder=root)
    ds = data_lib.SupervisedDataset([anno], tokenizer, da, cfg)

    out = str(tmp_path / "run")
    ocfg = opt_lib.OptimizerConfig(learning_rate=1e-3, mm_projector_lr=1e-2)
    # global batch = 1 * (data 2 * fsdp 2) = 4 -> one batch per epoch over 7
    # samples, so two epochs reach max_steps=2
    tcfg = TrainerConfig(output_dir=out, per_device_batch_size=1,
                         num_epochs=2, max_steps=2, seq_len=64,
                         save_steps=2, log_steps=1,
                         compute_dtype="float32",
                         mesh_data=2, mesh_fsdp=2, mesh_tensor=2)
    trainer = Trainer(cfg, params, ds, ocfg, tcfg)
    state = trainer.train()
    assert int(state.step) == 2
    assert os.path.exists(os.path.join(out, "train_log.jsonl"))
    with open(os.path.join(out, "train_log.jsonl")) as f:
        logs = [json.loads(l) for l in f]
    assert np.isfinite(logs[-1]["loss"])

    # resume: a new trainer picks up at step 2
    trainer2 = Trainer(cfg, params, ds, ocfg, tcfg)
    assert trainer2.start_step == 2


def _lora_setup(corpus, tokenizer, bits=16, r=4, lr=3e-3):
    import jax
    import jax.numpy as jnp
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.models import videollama2 as vl2
    from videollama2_tpu.ops import quant
    from videollama2_tpu.train import data as data_lib
    from videollama2_tpu.train import lora as lora_lib
    from videollama2_tpu.train import optimizer as opt_lib
    from videollama2_tpu.train import step as step_lib

    root, anno = corpus
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg)
    if bits in (4, 8):
        params["llm"] = quant.quantize_llm_params(params["llm"], bits=8)
    lcfg = lora_lib.LoraConfig(r=r, alpha=2 * r)
    params["llm"] = lora_lib.inject_lora(jax.random.PRNGKey(1),
                                         params["llm"], lcfg)
    da = data_lib.DataArguments(data_path=[anno], data_folder=root)
    ds = data_lib.SupervisedDataset([anno], tokenizer, da, cfg)
    collator = data_lib.Collator(cfg, seq_len=64)
    batch = collator([ds[0], ds[1]])

    ocfg = opt_lib.OptimizerConfig(learning_rate=lr, total_steps=40,
                                   warmup_ratio=0.0, schedule="constant",
                                   lora_enable=True)
    tx = opt_lib.build_optimizer(params, ocfg)
    trainable = opt_lib.trainable_mask(params, ocfg)
    step = step_lib.make_train_step(cfg, tx, compute_dtype=jnp.float32,
                                    attn_impl="xla", trainable=trainable)
    state = step_lib.init_state(params, tx)
    return cfg, params, state, step, batch, lcfg


def test_lora_step_updates_only_adapters(corpus, tokenizer):
    """LoRA training (reference train.py:465-481): after a step, only the
    injected a/b adapters and the projector change; the base LLM kernels,
    embeddings and vision tower are bit-identical."""
    import jax
    import numpy as np

    cfg, params, state, step, batch, _ = _lora_setup(corpus, tokenizer)
    # snapshot before stepping: the step donates the state, deleting sources
    params = jax.tree.map(lambda a: np.asarray(a), params)
    state1, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    flat0 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(state1.params)[0]
    changed, frozen_ok = [], []
    for (p0, l0), (p1, l1) in zip(flat0, flat1):
        key = "/".join(str(getattr(k, "key", k)) for k in p0)
        same = np.array_equal(np.asarray(l0), np.asarray(l1))
        if "/lora/" in key and key.rsplit("/", 1)[1] in ("a", "b"):
            changed.append((key, same))
        elif key.startswith("connector"):
            pass  # projector trains too (non-LoRA trainables)
        else:
            frozen_ok.append((key, same))
    # every adapter 'b' must move (a's grads flow through b=0 at step 1,
    # so b changes first); no frozen leaf may move
    assert any(not same for key, same in changed if key.endswith("/b")), \
        changed
    bad = [key for key, same in frozen_ok if not same]
    assert not bad, bad


def test_qlora_int8_base_trains(corpus, tokenizer):
    """QLoRA (reference train.py:404-423): int8-frozen base + adapters.
    The step must run (int8 leaves excluded from differentiation), the loss
    stays finite, and repeated steps reduce it."""
    import numpy as np

    cfg, params, state, step, batch, _ = _lora_setup(corpus, tokenizer,
                                                     bits=8, lr=1e-2)
    losses = []
    for _ in range(10):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses


def test_lora_split_save_roundtrip(corpus, tokenizer, tmp_path):
    """Split save (videollama2_trainer.py:343-361) -> load path (a):
    adapter_model.bin + non_lora_trainables.bin reload through
    convert_hf.load_videollama2 and match merge_lora_injected numerics."""
    import jax
    import numpy as np
    from videollama2_tpu.checkpoint import convert_hf, orbax_io
    from videollama2_tpu.train import lora as lora_lib
    from make_tiny_checkpoint import build_checkpoint

    base_dir = str(tmp_path / "base")
    build_checkpoint(base_dir)
    cfg, params = convert_hf.load_videollama2(base_dir)

    lcfg = lora_lib.LoraConfig(r=4, alpha=8)
    llm_l = lora_lib.inject_lora(jax.random.PRNGKey(1), params["llm"], lcfg)
    # give b nonzero values so the delta is visible
    layers = dict(llm_l["layers"])
    for name, entry in layers.items():
        if isinstance(entry, dict) and "lora" in entry:
            lo = dict(entry["lora"])
            lo["b"] = jax.random.normal(jax.random.PRNGKey(2),
                                        lo["b"].shape) * 0.02
            layers[name] = {**entry, "lora": lo}
    llm_l = {**llm_l, "layers": layers}

    out = str(tmp_path / "lora_ckpt")
    orbax_io.export_lora_split(out, llm_l, params["connector"], cfg)
    for fname in ("adapter_model.bin", "adapter_config.json",
                  "non_lora_trainables.bin", "config.json"):
        assert os.path.exists(os.path.join(out, fname)), fname

    cfg2, params2 = convert_hf.load_videollama2(out, model_base=base_dir)
    merged = lora_lib.merge_lora_injected(llm_l)
    got = params2["llm"]["layers"]["q"]["kernel"]
    want = merged["layers"]["q"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    # projector round-trips through non_lora_trainables
    p_got = jax.tree.leaves(params2["connector"])
    p_want = jax.tree.leaves(params["connector"])
    for g, w in zip(p_got, p_want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-6)


def test_loss_decreases(corpus, tokenizer):
    """Training actually learns: loss drops over repeated steps on a
    memorizable batch (single device, tiny model)."""
    import jax
    import jax.numpy as jnp
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.models import videollama2 as vl2
    from videollama2_tpu.train import data as data_lib
    from videollama2_tpu.train import optimizer as opt_lib
    from videollama2_tpu.train import step as step_lib

    root, anno = corpus
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg)
    da = data_lib.DataArguments(data_path=[anno], data_folder=root)
    ds = data_lib.SupervisedDataset([anno], tokenizer, da, cfg)
    collator = data_lib.Collator(cfg, seq_len=64)
    batch = collator([ds[0], ds[1]])

    ocfg = opt_lib.OptimizerConfig(learning_rate=3e-3, total_steps=40,
                                   warmup_ratio=0.0, schedule="constant")
    tx = opt_lib.build_optimizer(params, ocfg)
    step = step_lib.make_train_step(cfg, tx, compute_dtype=jnp.float32,
                                    attn_impl="xla")
    state = step_lib.init_state(params, tx)
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses


def test_preemption_signal_saves_and_resumes(corpus, tokenizer, tmp_path):
    """SIGTERM mid-training saves a checkpoint at the current step and
    exits cleanly; a new Trainer auto-resumes from it (preemptible TPU
    pools send SIGTERM; the reference's HF Trainer dies uncheckpointed)."""
    import os as _os
    import signal
    import jax
    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.models import videollama2 as vl2
    from videollama2_tpu.train import data as data_lib
    from videollama2_tpu.train import optimizer as opt_lib
    from videollama2_tpu.train.trainer import Trainer, TrainerConfig

    root, anno = corpus
    cfg = cfglib.tiny_model()
    params = vl2.init_params(jax.random.PRNGKey(0), cfg)
    da = data_lib.DataArguments(data_path=[anno], data_folder=root)
    ds = data_lib.SupervisedDataset([anno], tokenizer, da, cfg)
    out = str(tmp_path / "run")
    ocfg = opt_lib.OptimizerConfig(learning_rate=1e-3)
    tcfg = TrainerConfig(output_dir=out, per_device_batch_size=1,
                         num_epochs=8, max_steps=4, seq_len=64,
                         save_steps=100, log_steps=10,
                         compute_dtype="float32",
                         mesh_data=2, mesh_fsdp=2, mesh_tensor=2)
    trainer = Trainer(cfg, params, ds, ocfg, tcfg)

    orig_step, calls = trainer.step_fn, {"n": 0}

    def step_then_preempt(state, batch):
        calls["n"] += 1
        if calls["n"] == 1:  # signal lands while step 1 is in flight
            _os.kill(_os.getpid(), signal.SIGTERM)
        return orig_step(state, batch)

    trainer.step_fn = step_then_preempt
    state = trainer.train()
    assert int(state.step) == 1, "did not stop at the preempted step"
    from videollama2_tpu.checkpoint import orbax_io
    ckpt_dir = _os.path.join(out, "checkpoints")
    assert orbax_io.latest_step(ckpt_dir) == 1

    trainer2 = Trainer(cfg, params, ds, ocfg, tcfg)
    assert trainer2.start_step == 1
    state2 = trainer2.train()
    assert int(state2.step) == 4
