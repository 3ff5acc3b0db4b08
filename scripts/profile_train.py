"""Single-chip training-step throughput (SFT shape, bf16 + remat).

Measures the jitted multimodal train step — frozen ViT, trainable
connector+LLM (the reference finetune recipe's trainable set,
scripts/vllava/finetune.sh) — at a ~0.7B LLM scale that fits one 16 GB
chip with Adam state, and reports step time, tokens/sec, and model-FLOPs
utilization. TRAIN_SIZE=tiny for a CPU smoke.

The reference's training throughput lives entirely inside HF Trainer +
DeepSpeed and is never measured standalone; this gives the rebuild a
per-chip training baseline to scale with the mesh.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    if os.environ.get("PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from videollama2_tpu.core import config as cfglib
    from videollama2_tpu.models import videollama2 as vl2
    from videollama2_tpu.train import step as step_lib

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    size = os.environ.get("TRAIN_SIZE", "base" if on_tpu else "tiny")
    if size == "tiny":
        cfg = cfglib.tiny_model()
        B, S = 2, 64
    elif size == "7b-lora":
        # the reference QLoRA recipe at full model scale: frozen int8
        # Mistral-7B base + r=128 adapters + trainable projector
        # (scripts/custom/finetune_qlora.sh: --bits 4/8 --lora_r 128
        # --lora_alpha 256, seq 2048)
        cfg = cfglib.preset("videollama2_mistral")
        B, S = (int(os.environ.get("TRAIN_B", "2")),
                int(os.environ.get("TRAIN_S", "2048")))
    else:
        # ~0.7B-LLM SFT shape: hidden 1536 x 16 layers, CLIP-L/336 tower
        import dataclasses
        cfg = cfglib.preset("videollama2_mistral")
        cfg = dataclasses.replace(
            cfg,
            llm=dataclasses.replace(
                cfg.llm, hidden_size=1536, intermediate_size=6144,
                num_layers=16, num_heads=12, num_kv_heads=4, head_dim=128,
                vocab_size=32000),
            connector=dataclasses.replace(cfg.connector, hidden_size=1536),
            num_frames=8)
        B, S = (int(os.environ.get("TRAIN_B", "2")),
                int(os.environ.get("TRAIN_S", "1024")))

    rng = np.random.default_rng(0)
    T, H = cfg.num_frames, cfg.vision.image_size
    # timing-equivalent constant fills materialized ON the device (values
    # don't affect MXU/HBM timing; avoids minutes of host init + tunnel
    # upload — same trick as bench.py)
    abstract = jax.eval_shape(lambda: vl2.init_params(
        jax.random.PRNGKey(0), cfg,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32))
    if size == "7b-lora":
        from videollama2_tpu.train import lora as lora_lib
        from videollama2_tpu.train import optimizer as opt_lib
        from videollama2_tpu.utils import synthetic
        bits = int(os.environ.get("TRAIN_BITS", "8"))
        abstract = synthetic.quantized_abstract(abstract, quantize_llm=True,
                                                llm_bits=bits)
        params = synthetic.materialize_fills(abstract)
        lcfg = lora_lib.LoraConfig(r=128, alpha=256)
        # bf16 adapters (peft's compute dtype in the reference bf16 runs):
        # r=128 over 7 matmul families is 335M adapter params — f32
        # storage + f32 AdamW moments alone would cost 4 GB of the 16
        params["llm"] = lora_lib.inject_lora(jax.random.PRNGKey(0),
                                             params["llm"], lcfg,
                                             dtype=jnp.bfloat16)
        ocfg = opt_lib.OptimizerConfig(lora_enable=True)
        mask = opt_lib.trainable_mask(params, ocfg)
        tx = opt_lib.build_optimizer(params, ocfg)
    else:
        params = jax.jit(lambda: jax.tree.map(
            lambda a: jnp.full(a.shape, 0.01, a.dtype), abstract))()
        jax.block_until_ready(params)
        # frozen tower (reference train.py:534); connector+LLM trainable
        mask = jax.tree.map(lambda _: True, params)
        mask["vision"] = jax.tree.map(lambda _: False, params["vision"])
        tx = optax.adamw(1e-5)
    state = step_lib.init_state(params, tx)
    remat = {"full": True, "dots": "dots", "none": False}[
        os.environ.get("TRAIN_REMAT", "full")]
    train_step = step_lib.make_train_step(cfg, tx, trainable=mask,
                                          remat=remat)

    from videollama2_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
    from videollama2_tpu.train import data as data_lib
    ids, labels = [], []
    for _ in range(B):
        hi = min(1000, cfg.llm.vocab_size - 1)
        toks = [1, VIDEO_TOKEN_INDEX] + [int(x) for x in
                                         rng.integers(4, hi, 48)]
        ids.append(toks)
        labels.append([IGNORE_INDEX, IGNORE_INDEX] + toks[2:])
    plan = data_lib.plan_batch(ids, cfg.tokens_per_video, S,
                               batch_labels=labels)
    batch = data_lib.Batch(
        frames=rng.integers(0, 255, (B, T, H, H, 3), dtype=np.uint8),
        text_ids=plan.text_ids, is_visual=plan.is_visual,
        vis_index=plan.vis_index, positions=plan.positions,
        valid_len=plan.valid_len, labels=plan.labels)

    t0 = time.time()
    state, metrics = train_step(state, batch)
    loss = np.asarray(metrics["loss"])
    print(f"compile+first step: {time.time()-t0:.1f}s loss={float(loss):.3f}",
          file=sys.stderr, flush=True)

    # ONE-dispatch multi-step loop: a host loop of K dispatches pays the
    # tunnel's per-RPC queueing K times and inflates under load (the 5a
    # attribution run measured a 73 ms "attention fwd" whose compute is
    # ~10 us); a fori_loop carrying the train state serializes K genuine
    # steps inside a single program, so the wall clock is device time
    # + one RPC (the same design that makes profile_decode load-robust)
    iters = 8 if on_tpu else 2

    @functools.partial(jax.jit, donate_argnums=(0,))
    def steps_loop(st, b):
        def body(i, s):
            s2, _ = train_step(s, b)
            return s2
        return jax.lax.fori_loop(0, iters, body, st)

    state = steps_loop(state, batch)          # compile + warm
    np.asarray(jax.tree.leaves(state.params)[0].ravel()[:1])
    t0 = time.time()
    state = steps_loop(state, batch)
    np.asarray(jax.tree.leaves(state.params)[0].ravel()[:1])
    dt = (time.time() - t0) / iters

    if os.environ.get("ATTRIB", "0") == "1":
        _attribution(cfg, state, batch, train_step, tx, mask, remat, dt,
                     on_tpu, size)

    # model FLOPs: 6 * N_trainable * tokens (fwd+bwd) + frozen tower fwd
    lcfg = cfg.llm
    n_llm = (lcfg.num_layers * (
        lcfg.hidden_size * lcfg.head_dim * (lcfg.num_heads
                                            + 2 * lcfg.num_kv_heads)
        + lcfg.num_heads * lcfg.head_dim * lcfg.hidden_size
        + 3 * lcfg.hidden_size * lcfg.intermediate_size)
        + 2 * lcfg.vocab_size * lcfg.hidden_size)
    toks = B * S
    # frozen-base LoRA: fwd (2N) + dgrad through the base (2N), no base
    # wgrad — 4N useful FLOPs/token vs 6N for full finetuning
    flops = (4 if size == "7b-lora" else 6) * n_llm * toks
    peak = 197e12 if on_tpu else 1e12
    print(f"train step ({size}): {dt*1e3:.1f} ms/step, "
          f"{toks/dt:.0f} tok/s, llm-param count {n_llm/1e9:.2f}B, "
          f"~{flops/dt/1e12:.1f} TF/s ({100*flops/dt/peak:.0f}% of peak, "
          f"LLM fwd+bwd only — tower/connector excluded)", flush=True)


def _attribution(cfg, state, batch, train_step, tx, mask, remat, t_step,
                 on_tpu, size):
    """Component attribution of the train step (VERDICT r5 #3), mirroring
    the decode floor table in docs/DESIGN.md.

    Every stage runs as ONE dispatch: a jitted fori_loop of R repetitions
    whose carry feeds each iteration's output into the next iteration's
    input, so XLA can neither hoist the stage out of the loop (inputs are
    loop-variant) nor DCE its backward (every grad leaf feeds the carry).
    Host-looped per-stage dispatches are useless on this backend — the
    tunnel's per-RPC queueing under load dwarfs small-stage compute (the
    first TPU attribution run measured 73 ms for an attention forward whose
    compute is ~10 us, and a negative derived backward). A null dispatch is
    timed and subtracted so sub-ms stages stay meaningful.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from videollama2_tpu.models import llm as llm_lib
    from videollama2_tpu.models import videollama2 as vl2
    from videollama2_tpu.ops import attention as attn_ops
    from videollama2_tpu.train import step as step_lib

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = state.params
    B, S = batch.text_ids.shape
    lcfg = cfg.llm
    R = int(os.environ.get("ATTRIB_REPS", "8" if on_tpu else "1"))

    def sync(tree):
        np.asarray(jax.tree.leaves(tree)[0]).ravel()[:1]

    # dispatch+readback floor, subtracted from every stage
    null = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    sync(null(z))
    t0 = time.time()
    sync(null(z))
    t_null = time.time() - t0

    def timed(name, fn, *args):
        out = fn(*args)                      # compile + warmup
        sync(out)
        t0 = time.time()
        out = fn(*args)
        sync(out)
        dt = max(time.time() - t0 - t_null, 0.0) / R
        print(f"  {name:<28} {dt*1e3:9.1f} ms", flush=True)
        return dt

    print(f"[attribution] step={t_step*1e3:.1f} ms  B={B} S={S}  "
          f"reps/dispatch={R}  null dispatch {t_null*1e3:.1f} ms",
          flush=True)

    frames0 = jnp.asarray(batch.frames)

    def bump_like(x, scalar):
        # data-dependent zero: tanh(scalar)*1e-30 rounds to 0 at runtime
        # but the compiler cannot prove it, so the carry chain is real
        return (jnp.tanh(scalar.astype(jnp.float32)) * 1e-30).astype(x.dtype)

    # 1. full forward (loss only)
    @jax.jit
    def fwd_only(params, b):
        def body(i, carry):
            acc, fr = carry
            loss, _ = step_lib._loss_fn(params, cfg, b._replace(frames=fr),
                                        dtype, "auto", None, remat)
            return acc + loss, fr + bump_like(fr, loss)
        acc, _ = jax.lax.fori_loop(0, R, body, (jnp.float32(0), frames0))
        return acc
    t_fwd = timed("forward (loss only)", fwd_only, params, batch)

    # 2. grads (no optimizer); every grad leaf feeds the carry
    @jax.jit
    def grad_only(params, b):
        def body(i, carry):
            acc, fr = carry
            (loss, _), grads = jax.value_and_grad(
                step_lib._loss_fn, has_aux=True)(
                    params, cfg, b._replace(frames=fr), dtype, "auto", None,
                    remat)
            touch = sum(g.ravel()[0].astype(jnp.float32)
                        for g in jax.tree.leaves(grads))
            return acc + loss + touch * 1e-30, fr + bump_like(fr, loss)
        acc, _ = jax.lax.fori_loop(0, R, body, (jnp.float32(0), frames0))
        return acc
    try:
        t_grad = timed("forward+backward", grad_only, params, batch)
    except Exception as e:  # QLoRA int8 bases can't be cotangents
        print(f"  forward+backward           skipped ({type(e).__name__})",
              flush=True)
        t_grad = None

    # 3. frozen tower + connector (inside the fwd)
    @jax.jit
    def vit_loop(params, fr0):
        def body(i, carry):
            acc, fr = carry
            feats = vl2.encode_frames(params, cfg, fr)
            m = jnp.mean(feats.astype(jnp.float32))
            return acc + m, fr + bump_like(fr, m)
        acc, _ = jax.lax.fori_loop(0, R, body, (jnp.float32(0), frames0))
        return acc
    t_vit = timed("ViT+connector encode", vit_loop, params, frames0)

    # 4. LLM forward alone on pre-spliced embeds (h feeds the next input)
    positions = jnp.asarray(batch.positions)
    valid = jnp.asarray(batch.valid_len)

    @jax.jit
    def llm_fwd(params, e0):
        def body(i, e):
            h, _ = llm_lib.forward(params["llm"], lcfg, e, positions, valid,
                                   attn_impl="auto", remat=remat)
            return jnp.tanh(h)
        return jax.lax.fori_loop(0, R, body, e0)
    t_llm_fwd = timed("LLM forward (scan)", llm_fwd, params,
                      jnp.zeros((B, S, lcfg.hidden_size), dtype))

    # 5. lm_head + CE loss fwd+bwd (the [B*S, D] x [D, V] pair); dh -> h
    labels = jnp.asarray(batch.labels)

    @jax.jit
    def head_loss_grad(params, h0):
        def f(h):
            logits = llm_lib.lm_logits(params["llm"], lcfg, h)
            lab = jnp.maximum(labels[:, 1:], 0)
            logp = jax.nn.log_softmax(logits[:, :-1], -1)
            return -jnp.take_along_axis(logp, lab[..., None], -1).mean()
        def body(i, carry):
            acc, h = carry
            loss, dh = jax.value_and_grad(f)(h)
            return acc + loss, jnp.tanh(dh) * 0.1
        acc, _ = jax.lax.fori_loop(0, R, body,
                                   (jnp.float32(0), h0))
        return acc
    t_head = timed("lm_head+CE fwd+bwd", head_loss_grad, params,
                   jnp.zeros((B, S, lcfg.hidden_size), dtype))

    # 6. attention fwd / bwd at the training shape (x num_layers derived)
    Hh, Kh, hd = lcfg.num_heads, lcfg.num_kv_heads, lcfg.head_dim
    rngk = jax.random.PRNGKey(0)
    q0 = jax.random.normal(rngk, (B, S, Hh, hd), dtype) * 0.1
    k0 = jax.random.normal(rngk, (B, S, Kh, hd), dtype) * 0.1
    v0 = jax.random.normal(rngk, (B, S, Kh, hd), dtype) * 0.1
    L = lcfg.num_layers
    impl = "pallas" if on_tpu else "xla"

    def make_attn_fwd(impl):
        @jax.jit
        def attn_fwd(qq, k, v):
            def body(i, q):
                o = attn_ops.attend(q, k, v, valid_len=valid, causal=True,
                                    impl=impl)
                return o.astype(q.dtype)
            return jax.lax.fori_loop(0, R, body, qq)
        return attn_fwd
    t_attn_f = timed("attention fwd (1 layer)", make_attn_fwd(impl),
                     q0, k0, v0)

    def make_attn_grad(impl):
        @jax.jit
        def attn_grad(qq, kk, vv):
            def f(q, k, v):
                o = attn_ops.attend(q, k, v, valid_len=valid, causal=True,
                                    impl=impl)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            def body(i, carry):
                q, k, v = carry
                dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
                return (jnp.tanh(dq) * 0.1, jnp.tanh(dk) * 0.1,
                        jnp.tanh(dv) * 0.1)
            return jax.lax.fori_loop(0, R, body, (qq, kk, vv))
        return attn_grad
    t_attn_fb = timed("attention fwd+bwd (1 layer)", make_attn_grad(impl),
                      q0, k0, v0)
    try:
        t_attn_fb_xla = timed("attention fwd+bwd XLA ref",
                              make_attn_grad("xla"), q0, k0, v0)
    except Exception as e:
        print(f"  attention fwd+bwd XLA ref  OOM/err ({type(e).__name__})",
              flush=True)
        t_attn_fb_xla = float("nan")

    # 7. optimizer update isolated (params + opt state carried)
    if t_grad is not None:
        @jax.jit
        def grads_once(params, b):
            _, grads = jax.value_and_grad(
                step_lib._loss_fn, has_aux=True)(params, cfg, b, dtype,
                                                 "auto", None, remat)
            return grads
        grads = grads_once(params, batch)

        @jax.jit
        def opt_loop(grads, params, opt_state):
            def body(i, carry):
                p, o = carry
                updates, o2 = tx.update(grads, o, p)
                return optax.apply_updates(p, updates), o2
            return jax.lax.fori_loop(0, R, body, (params, opt_state))
        t_opt = timed("optimizer update", opt_loop, grads, params,
                      state.opt_state)
    else:
        t_opt = float("nan")

    print("[attribution] derived:", flush=True)
    attn_f_all = t_attn_f * L
    attn_b_all = (t_attn_fb - t_attn_f) * L
    print(f"  attention fwd x{L}: {attn_f_all*1e3:.1f} ms | "
          f"attention bwd x{L}: {attn_b_all*1e3:.1f} ms "
          f"(XLA-ref bwd would be "
          f"{(t_attn_fb_xla - t_attn_f) * L * 1e3:.1f} ms)", flush=True)
    if t_grad is not None:
        # full remat: grad = fwd + re-forward (~= llm fwd) + bwd proper
        reforward = t_llm_fwd if remat is True else 0.0
        bwd_proper = t_grad - t_fwd - reforward
        print(f"  step {t_step*1e3:.1f} = grad {t_grad*1e3:.1f} "
              f"+ opt {t_opt*1e3:.1f} "
              f"+ residual {(t_step-t_grad-t_opt)*1e3:.1f} ms", flush=True)
        print(f"  grad {t_grad*1e3:.1f} = fwd {t_fwd*1e3:.1f} "
              f"(vit {t_vit*1e3:.1f} + llm {t_llm_fwd*1e3:.1f} + head/other "
              f"{(t_fwd-t_vit-t_llm_fwd)*1e3:.1f}) "
              f"+ remat re-forward ~{reforward*1e3:.1f} "
              f"+ bwd proper ~{bwd_proper*1e3:.1f} ms "
              f"(of which attention bwd {attn_b_all*1e3:.1f}, "
              f"head bwd ~{max(t_head - t_head/3, 0)*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
