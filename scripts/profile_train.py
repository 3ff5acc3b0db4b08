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

    # host loop of async dispatches + ONE readback: the dispatches pipeline
    # on the device so per-RPC queueing amortizes to ~1 RPC total. (A
    # fori_loop-of-steps variant was tried and REVERTED: wrapping the
    # donated train_step in a loop body ignores donation, so params/opt
    # copies inflated the step 13% — 587.5 vs 519.8 ms at S=2048 B=4.
    # Donation-preserving host loop measures the production configuration.)
    iters = 8 if on_tpu else 2
    t0 = time.time()
    for _ in range(iters):
        state, metrics = train_step(state, batch)
    np.asarray(metrics["loss"])
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

    Tunnel-robust design (the first two TPU runs were noise):
      * every stage is ONE dispatch — a jitted fori_loop of R repetitions
        whose carry feeds each iteration's output into the next input, so
        XLA can neither hoist the stage out of the loop nor DCE its
        backward (every grad leaf touches the carry);
      * R is per-stage, sized so device work dominates the tunnel's
        per-RPC jitter (an attention layer here is ~0.1 ms of compute —
        against a ~40 ms RPC floor it needs thousands of reps);
      * each stage takes the MIN of several dispatch samples (queue delay
        is one-sided additive noise) and subtracts a min-sampled null
        dispatch.
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
    # reps per dispatch: heavy (full fwd/grad), medium (single-module
    # forwards, optimizer), light (per-layer attention / head)
    if on_tpu:
        RH = int(os.environ.get("ATTRIB_REPS_HEAVY", "8"))
        RM = int(os.environ.get("ATTRIB_REPS_MED", "32"))
        RL = int(os.environ.get("ATTRIB_REPS_LIGHT", "4096"))
    else:
        RH, RM, RL = 1, 1, 2
    SAMPLES = int(os.environ.get("ATTRIB_SAMPLES", "5" if on_tpu else "1"))

    def sync(tree):
        np.asarray(jax.tree.leaves(tree)[0]).ravel()[:1]

    def min_time(fn, *args):
        out = fn(*args)                       # compile + warm
        sync(out)
        best = float("inf")
        for _ in range(SAMPLES):
            t0 = time.time()
            out = fn(*args)
            sync(out)
            best = min(best, time.time() - t0)
        return best

    null = jax.jit(lambda x: x + 1.0)
    t_null = min_time(null, jnp.zeros(()))

    def timed(name, make_fn, reps, *args):
        try:
            fn = make_fn(reps)
            dt = max(min_time(fn, *args) - t_null, 0.0) / reps
        except Exception as e:  # noqa: BLE001 - report and keep attributing
            # the remote compile service 500s on some large loop bodies
            # (e.g. fori_loop over the full grad at base scale); fall back
            # to a pipelined host loop of the R=1 program — reps async
            # dispatches + one readback still amortize to ~1 RPC
            try:
                fn1 = make_fn(1)
                out = fn1(*args)                  # compile + warm
                sync(out)
                best = float("inf")
                for _ in range(SAMPLES):
                    t0 = time.time()
                    for _ in range(reps):
                        out = fn1(*args)
                    sync(out)
                    best = min(best, time.time() - t0)
                dt = max(best - t_null, 0.0) / reps
                print(f"  {name:<28} {dt*1e3:9.2f} ms  "
                      f"(x{reps} host-pipelined; loop compile failed)",
                      flush=True)
                return dt
            except Exception as e2:  # noqa: BLE001
                print(f"  {name:<28} skipped: {repr(e)[:120]} / "
                      f"{repr(e2)[:80]}", flush=True)
                return None
        print(f"  {name:<28} {dt*1e3:9.2f} ms  (x{reps}/dispatch)",
              flush=True)
        return dt

    print(f"[attribution] step={t_step*1e3:.1f} ms  B={B} S={S}  "
          f"reps H/M/L={RH}/{RM}/{RL} min-of-{SAMPLES}  "
          f"null dispatch {t_null*1e3:.1f} ms", flush=True)

    frames0 = jnp.asarray(batch.frames)

    def bump_like(x, scalar):
        # data-dependent zero: tanh(scalar)*1e-30 rounds to 0 at runtime
        # but the compiler cannot prove it, so the carry chain is real
        return (jnp.tanh(scalar.astype(jnp.float32)) * 1e-30).astype(x.dtype)

    # 1. full forward (loss only)
    def make_fwd(R):
        @jax.jit
        def fwd_only(params, b):
            def body(i, carry):
                acc, fr = carry
                loss, _ = step_lib._loss_fn(
                    params, cfg, b._replace(frames=fr), dtype, "auto", None,
                    remat)
                return acc + loss, fr + bump_like(fr, loss)
            acc, _ = jax.lax.fori_loop(0, R, body, (jnp.float32(0), frames0))
            return acc
        return fwd_only
    t_fwd = timed("forward (loss only)", make_fwd, RH, params, batch)

    # 2. grads (no optimizer); every grad leaf feeds the carry
    def make_grad(R):
        @jax.jit
        def grad_only(params, b):
            def body(i, carry):
                acc, fr = carry
                (loss, _), grads = jax.value_and_grad(
                    step_lib._loss_fn, has_aux=True)(
                        params, cfg, b._replace(frames=fr), dtype, "auto",
                        None, remat)
                touch = sum(g.ravel()[0].astype(jnp.float32)
                            for g in jax.tree.leaves(grads))
                return acc + loss + touch * 1e-30, fr + bump_like(fr, loss)
            acc, _ = jax.lax.fori_loop(0, R, body, (jnp.float32(0), frames0))
            return acc
        return grad_only
    t_grad = timed("forward+backward", make_grad, RH, params, batch)

    # 3. frozen tower + connector (inside the fwd)
    def make_vit(R):
        @jax.jit
        def vit_loop(params, fr0):
            def body(i, carry):
                acc, fr = carry
                feats = vl2.encode_frames(params, cfg, fr)
                m = jnp.mean(feats.astype(jnp.float32))
                return acc + m, fr + bump_like(fr, m)
            acc, _ = jax.lax.fori_loop(0, R, body, (jnp.float32(0), fr0))
            return acc
        return vit_loop
    t_vit = timed("ViT+connector encode", make_vit, RM, params, frames0)

    # 4. LLM forward alone on pre-spliced embeds (h feeds the next input)
    positions = jnp.asarray(batch.positions)
    valid = jnp.asarray(batch.valid_len)

    def make_llm_fwd(R):
        @jax.jit
        def llm_fwd(params, e0):
            def body(i, e):
                h, _ = llm_lib.forward(params["llm"], lcfg, e, positions,
                                       valid, attn_impl="auto", remat=remat)
                return jnp.tanh(h)
            return jax.lax.fori_loop(0, R, body, e0)
        return llm_fwd
    t_llm_fwd = timed("LLM forward (scan)", make_llm_fwd, RM, params,
                      jnp.zeros((B, S, lcfg.hidden_size), dtype))

    # 5. lm_head + CE loss fwd+bwd (the [B*S, D] x [D, V] pair); dh -> h
    labels = jnp.asarray(batch.labels)

    def make_head(R):
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
            acc, _ = jax.lax.fori_loop(0, R, body, (jnp.float32(0), h0))
            return acc
        return head_loss_grad
    t_head = timed("lm_head+CE fwd+bwd", make_head, RM, params,
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
        def make(R):
            @jax.jit
            def attn_fwd(qq, k, v):
                def body(i, q):
                    o = attn_ops.attend(q, k, v, valid_len=valid,
                                        causal=True, impl=impl)
                    return o.astype(q.dtype)
                return jax.lax.fori_loop(0, R, body, qq)
            return attn_fwd
        return make
    t_attn_f = timed("attention fwd (1 layer)", make_attn_fwd(impl), RL,
                     q0, k0, v0)

    def make_attn_grad(impl):
        def make(R):
            @jax.jit
            def attn_grad(qq, kk, vv):
                def f(q, k, v):
                    o = attn_ops.attend(q, k, v, valid_len=valid,
                                        causal=True, impl=impl)
                    return jnp.sum(o.astype(jnp.float32) ** 2)
                def body(i, carry):
                    q, k, v = carry
                    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
                    return (jnp.tanh(dq) * 0.1, jnp.tanh(dk) * 0.1,
                            jnp.tanh(dv) * 0.1)
                return jax.lax.fori_loop(0, R, body, (qq, kk, vv))
            return attn_grad
        return make
    t_attn_fb = timed("attention fwd+bwd (1 layer)", make_attn_grad(impl),
                      RL, q0, k0, v0)
    t_attn_fb_xla = timed("attention fwd+bwd XLA ref", make_attn_grad("xla"),
                          RL, q0, k0, v0)

    # 7. optimizer update isolated (params + opt state carried)
    t_opt = None
    if t_grad is not None:
        @jax.jit
        def grads_once(params, b):
            _, grads = jax.value_and_grad(
                step_lib._loss_fn, has_aux=True)(params, cfg, b, dtype,
                                                 "auto", None, remat)
            return grads
        grads = grads_once(params, batch)

        def make_opt(R):
            @jax.jit
            def opt_loop(grads, params, opt_state):
                def body(i, carry):
                    p, o = carry
                    updates, o2 = tx.update(grads, o, p)
                    return optax.apply_updates(p, updates), o2
                return jax.lax.fori_loop(0, R, body, (params, opt_state))
            return opt_loop
        t_opt = timed("optimizer update", make_opt, RM, grads, params,
                      state.opt_state)

    print("[attribution] derived:", flush=True)
    if t_attn_f is not None and t_attn_fb is not None:
        attn_f_all = t_attn_f * L
        attn_b_all = (t_attn_fb - t_attn_f) * L
        xla_note = ("" if t_attn_fb_xla is None else
                    f" (XLA-ref bwd would be "
                    f"{(t_attn_fb_xla - t_attn_f) * L * 1e3:.1f} ms)")
        print(f"  attention fwd x{L}: {attn_f_all*1e3:.1f} ms | "
              f"attention bwd x{L}: {attn_b_all*1e3:.1f} ms{xla_note}",
              flush=True)
    else:
        attn_b_all = float("nan")
    if t_grad is not None and t_fwd is not None and t_opt is not None:
        # full remat: grad = fwd + re-forward (~= llm fwd) + bwd proper
        reforward = t_llm_fwd if (remat is True
                                  and t_llm_fwd is not None) else 0.0
        bwd_proper = t_grad - t_fwd - reforward
        print(f"  step {t_step*1e3:.1f} = grad {t_grad*1e3:.1f} "
              f"+ opt {t_opt*1e3:.1f} "
              f"+ residual {(t_step-t_grad-t_opt)*1e3:.1f} ms", flush=True)
        if t_vit is not None and t_llm_fwd is not None:
            # t_head can be None when its stage failed remote compile
            # (the exact failure mode timed() is built to survive)
            head_bwd = ("?" if t_head is None
                        else f"{max(t_head - t_head/3, 0)*1e3:.1f}")
            print(f"  grad {t_grad*1e3:.1f} = fwd {t_fwd*1e3:.1f} "
                  f"(vit {t_vit*1e3:.1f} + llm {t_llm_fwd*1e3:.1f} "
                  f"+ head/other {(t_fwd-t_vit-t_llm_fwd)*1e3:.1f}) "
                  f"+ remat re-forward ~{reforward*1e3:.1f} "
                  f"+ bwd proper ~{bwd_proper*1e3:.1f} ms "
                  f"(of which attention bwd {attn_b_all*1e3:.1f}, "
                  f"head bwd ~{head_bwd})",
                  flush=True)


if __name__ == "__main__":
    main()
