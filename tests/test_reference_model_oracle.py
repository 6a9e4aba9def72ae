"""THE model-parity proof: the mounted reference's own `sam/sa_m4c.py`
(SpatialBertSelfAttention :399-610, MMT/PrevPredEmbeddings :773-948, greedy
loop :280-302) executes VERBATIM under a pytorch_transformers shim, loaded
with our flax model's weights via the converter name map, and must reproduce
our scores — teacher-forced and through the full 12-step greedy decode,
across c3/c5 contexts, quadrant variants, use_bias, aux heads, and the
text-projection configuration.

This retires the transcription risk of tests/test_torch_oracle_full.py: the
oracle here is not our transcription of the reference but the reference.
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from conftest import reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("/root/reference not mounted", allow_module_level=True)

from reference_model_oracle import (
    load_reference_sam4c,
    shim_config,
    state_dict_from_flax_params,
    torch_batch,
)

NUM_ANSWERS = 40
BOS_IDX = 1
TEXT_VOCAB = 512  # shrunk word-embedding table (indices remapped mod this)


def _configs(mmt_overrides=None, tb_overrides=None):
    """Frozen configs with dropouts zeroed (so the reference's train-mode
    teacher-forced branch is deterministic) and small FFN/vocab for CPU."""
    from sam_textvqa_tpu.config import task_config_from_dict

    cfg = task_config_from_dict({"SA-M4C": {}, "TextBERT": {"num_hidden_layers": 3}})
    mmt = dataclasses.replace(
        cfg.mmt,
        intermediate_size=256,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        obj_drop=0.0,
        ocr_drop=0.0,
        **(mmt_overrides or {}),
    )
    tb = dataclasses.replace(
        cfg.text_bert,
        vocab_size=TEXT_VOCAB,
        intermediate_size=256,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        text_bert_init_from_bert_base=False,
        **(tb_overrides or {}),
    )
    return dataclasses.replace(cfg, mmt=mmt, text_bert=tb)


def _batch(task, batch_size=2, seed=0):
    from sam_textvqa_tpu.data.synthetic import device_batch, make_batch

    batch_np = device_batch(make_batch(task, batch_size, seed=seed,
                                       num_answers_vocab=NUM_ANSWERS))
    # remap BERT-range token ids into the shrunk text vocab (0 stays 0)
    batch_np["question_indices"] = (
        batch_np["question_indices"] % TEXT_VOCAB
    ).astype(np.int32)
    return batch_np


def _build_pair(task, seed=0):
    """(flax scores fn inputs, loaded reference torch model)."""
    import jax
    import jax.numpy as jnp

    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams

    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, NUM_ANSWERS))
    batch_np = _batch(task, seed=seed)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    params = model.init({"params": jax.random.PRNGKey(seed)}, batch)["params"]

    sa_m4c = load_reference_sam4c(NUM_ANSWERS, bos_idx=BOS_IDX)
    mmt_cfg = shim_config(task.mmt)
    tb_cfg = shim_config(task.text_bert)
    ref_model = sa_m4c.SAM4C(mmt_cfg, tb_cfg)

    p_np = jax.tree.map(lambda v: np.asarray(v), params)
    sd, unmapped = state_dict_from_flax_params(
        p_np, list(task.mmt.layer_type_list), task.text_bert.num_hidden_layers
    )
    assert not unmapped, f"flax leaves without a reference name: {unmapped}"
    missing, unexpected = ref_model.load_state_dict(sd, strict=False)
    assert not missing, f"reference params not covered by our tree: {missing}"
    assert not unexpected, f"our tree has keys the reference lacks: {unexpected}"

    from sam_textvqa_tpu.config import MATRIX_TYPE_MAP

    ctx_keys = sorted(
        {MATRIX_TYPE_MAP[m] for lt, m in
         zip(task.mmt.layer_type_list, task.mmt.mix_list) if lt in ("s", "i")}
    )
    tbatch = torch_batch(batch_np, ctx_keys)
    return model, params, batch, batch_np, ref_model, tbatch


VARIANTS = {
    "c3": {},
    "c5": {"mix_list": ("none", "none", "share5", "share5", "share5", "share5")},
    "quad-1247": {"attention_mask_quadrants": (1, 2, 4, 7)},
    "quad-289": {"attention_mask_quadrants": (2, 8, 9)},
    "bias-aux-mul": {"use_bias": True, "use_aux_heads": True,
                     "aux_spatial_fusion": "mul"},
    "bias-aux-add": {"use_bias": True, "use_aux_heads": True,
                     "aux_spatial_fusion": "add"},
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_teacher_forced_matches_reference(variant):
    """Train-mode (teacher-forced) forward: reference sa_m4c.py executed
    verbatim vs our flax model under shared weights."""
    task = _configs(mmt_overrides=VARIANTS[variant])
    model, params, batch, batch_np, ref_model, tbatch = _build_pair(task)

    ours = model.apply({"params": params}, batch, deterministic=True)

    ref_model.train()  # teacher-forced branch; dropouts are all 0.0
    with torch.no_grad():
        ref_out = ref_model(tbatch)
    ref_scores = ref_out["textvqa_scores"].numpy()

    np.testing.assert_allclose(
        np.asarray(ours["scores"]), ref_scores, rtol=2e-4, atol=2e-4
    )
    if task.mmt.use_aux_heads:
        np.testing.assert_allclose(
            np.asarray(ours["spatial_head_out"]),
            tbatch["spatial_head_out"].numpy(),
            rtol=2e-4,
            atol=2e-4,
        )


def test_text_projection_matches_reference():
    """mmt hidden != 768 engages text_bert_out_linear on both sides
    (reference sa_m4c.py:93-103)."""
    task = _configs(mmt_overrides={"hidden_size": 96, "ptr_query_size": 96})
    model, params, batch, batch_np, ref_model, tbatch = _build_pair(task)
    ours = model.apply({"params": params}, batch, deterministic=True)
    ref_model.train()
    with torch.no_grad():
        ref_out = ref_model(tbatch)
    np.testing.assert_allclose(
        np.asarray(ours["scores"]), ref_out["textvqa_scores"].numpy(),
        rtol=2e-4, atol=2e-4,
    )


def test_greedy_loop_matches_reference():
    """The reference's 12-step eval loop (sa_m4c.py:285-302) vs our
    lax.scan greedy decode: identical final scores and argmax ids."""
    from sam_textvqa_tpu.models.sa_m4c import greedy_decode

    task = _configs()
    model, params, batch, batch_np, ref_model, tbatch = _build_pair(task)

    final_scores, pred_ids = greedy_decode(model, params, batch, bos_idx=BOS_IDX)

    ref_model.eval()
    with torch.no_grad():
        ref_out = ref_model(tbatch)
    ref_scores = ref_out["textvqa_scores"].numpy()
    ref_ids = ref_scores.argmax(axis=-1)

    np.testing.assert_array_equal(np.asarray(pred_ids), ref_ids)
    np.testing.assert_allclose(
        np.asarray(final_scores), ref_scores, rtol=2e-4, atol=2e-4
    )
    # the autoregressive feedback path must agree too: the reference's final
    # prev_inds are the BOS + shifted argmaxes it actually fed back
    ref_prev = tbatch["train_prev_inds"].numpy()
    ours_prev = np.concatenate(
        [np.full((ref_prev.shape[0], 1), BOS_IDX), np.asarray(pred_ids)[:, :-1]],
        axis=1,
    )
    np.testing.assert_array_equal(ours_prev, ref_prev)


def _torch_bce_loss(scores, targets, loss_mask):
    """Literal transcription of M4CDecodingBCEWithMaskLoss
    (reference sam/task_utils.py:19-30) for the torch side of the
    trajectory oracle."""
    losses = torch.nn.functional.binary_cross_entropy_with_logits(
        scores, targets, reduction="none"
    )
    losses = losses * loss_mask.unsqueeze(-1)
    count = torch.max(loss_mask.sum(), torch.tensor(1.0))
    return losses.sum() / count


@pytest.mark.parametrize("variant", ["c3", "c5", "c3-tb-scaled"])
def test_optimizer_trajectory_matches_reference(variant, monkeypatch):
    """THE training-dynamics parity proof: N full optimizer steps on both
    stacks from shared weights — torch Adam + LambdaLR + clip_grad_norm 0.25
    exactly as the reference steps them (train.py:138-144,
    task_utils.py:33-57) vs our optax chain
    (training/optimizer.py:make_optimizer) driven by the real jitted
    train_step.  Asserts per-step loss agreement and final parameter
    agreement (via the converter name map) across warmup AND both decay
    milestones: warmup_iters=3, decay at steps 5 and 7, 10 steps total.

    Dropouts are zeroed so both sides are deterministic; each step consumes
    a fresh identical batch (fresh teacher-forcing targets), mirroring real
    training rather than single-batch overfit."""
    import dataclasses as dc
    from bisect import bisect

    import jax
    import jax.numpy as jnp

    from sam_textvqa_tpu.config import MATRIX_TYPE_MAP
    from sam_textvqa_tpu.training.optimizer import make_optimizer
    from sam_textvqa_tpu.training.step import create_train_state, make_train_step

    n_steps = 10
    scaled_tb = variant == "c3-tb-scaled"
    task = _configs(mmt_overrides=VARIANTS["c3" if scaled_tb else variant])
    task = dc.replace(
        task, lr=5e-4, warmup_iters=3, warmup_factor=0.2,
        lr_decay_iters=(5, 7), lr_decay=0.1, max_grad_norm=0.25,
    )
    if scaled_tb:
        # exercise the 0.1 text_bert LR-scale path (reference sa_m4c.py:74-88
        # registers the finetune group only under init-from-bert-base); the
        # shim's from_pretrained is patched to plain construction — weights
        # are immediately overwritten with the shared flax init anyway
        import reference_model_oracle as rmo

        task = dc.replace(
            task,
            text_bert=dc.replace(task.text_bert, text_bert_init_from_bert_base=True),
        )
        monkeypatch.setattr(
            rmo.BertPreTrainedModel,
            "from_pretrained",
            classmethod(lambda cls, name, config=None, **kw: cls(config)),
        )
    model, params, batch, batch_np, ref_model, tbatch = _build_pair(task)

    ctx_keys = sorted(
        {MATRIX_TYPE_MAP[m] for lt, m in
         zip(task.mmt.layer_type_list, task.mmt.mix_list) if lt in ("s", "i")}
    )
    batches_np = [_batch(task, seed=1000 + i) for i in range(n_steps)]

    # ---- torch side: the reference's exact update sequence ----
    groups = ref_model.get_optimizer_parameters(task.lr)
    opt = torch.optim.Adam(groups, lr=task.lr)

    def lr_update(_iter):  # reference task_utils.py:48-56
        if _iter <= task.warmup_iters:
            alpha = float(_iter) / float(task.warmup_iters)
            return task.warmup_factor * (1.0 - alpha) + alpha
        return pow(task.lr_decay, bisect(list(task.lr_decay_iters), _iter))

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lr_update)
    ref_model.train()
    torch_losses = []
    for bnp in batches_np:
        tb = torch_batch(bnp, ctx_keys)
        out = ref_model(tb)
        loss = _torch_bce_loss(
            out["textvqa_scores"], tb["targets"], tb["train_loss_mask"]
        )
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            ref_model.parameters(), task.max_grad_norm
        )
        opt.step()
        sched.step()
        ref_model.zero_grad()
        torch_losses.append(float(loss.detach()))

    # ---- jax side: the real production train step, jitted ----
    optimizer = make_optimizer(params, task)
    train_step = jax.jit(make_train_step(model, optimizer))
    state = create_train_state(params, optimizer)
    rng = jax.random.PRNGKey(0)  # inert: every dropout prob is 0.0
    jax_losses = []
    for bnp in batches_np:
        jb = {k: jnp.asarray(v) for k, v in bnp.items()}
        state, metrics = train_step(state, jb, rng)
        jax_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(
        jax_losses, torch_losses, rtol=5e-4, atol=5e-4,
        err_msg=f"per-step loss trajectories diverged: jax={jax_losses} "
                f"torch={torch_losses}",
    )

    # ---- final parameters, compared through the converter name map ----
    layer_types = list(task.mmt.layer_type_list)
    n_tb = task.text_bert.num_hidden_layers
    sd_final, _ = state_dict_from_flax_params(
        jax.tree.map(lambda v: np.asarray(v), state.params), layer_types, n_tb
    )
    sd_init, _ = state_dict_from_flax_params(
        jax.tree.map(lambda v: np.asarray(v), params), layer_types, n_tb
    )
    ref_sd = {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
    worst = (0.0, None)
    for k, ours in sd_final.items():
        ours = np.asarray(ours.detach().cpu()) if hasattr(ours, "detach") else np.asarray(ours)
        theirs = ref_sd[k]
        init = np.asarray(sd_init[k].detach().cpu()) if hasattr(sd_init[k], "detach") else np.asarray(sd_init[k])
        # the reference side must actually have moved (update reached it)
        delta_scale = float(np.abs(theirs - init).max())
        diff = float(np.abs(ours - theirs).max())
        tol = max(2e-6, 0.01 * max(delta_scale, 1e-8))
        if diff / tol > worst[0]:
            worst = (diff / tol, (k, diff, delta_scale))
        assert diff <= tol, (
            f"param {k}: max|ours-torch|={diff:.3e} exceeds tol {tol:.3e} "
            f"(torch-side max update magnitude {delta_scale:.3e})"
        )
    # every parameter group received nonzero updates in this short run
    moved = [k for k in sd_final if np.abs(ref_sd[k] - (
        np.asarray(sd_init[k].detach().cpu()) if hasattr(sd_init[k], "detach") else np.asarray(sd_init[k])
    )).max() > 0]
    assert len(moved) > 0.9 * len(sd_final), "most params should have moved"


def test_reference_checkpoint_to_answers_e2e():
    """The full north-star path minus real weights: a reference-layout
    torch checkpoint (the reference model's OWN random initialization)
    converts through convert_torch_state_dict into our params; the
    reference then runs its eval loop verbatim on the same batch, and both
    stacks must produce identical answer ids AND identical decoded answer
    strings through the EvalAI decoder. When best_model.tar becomes
    available, this exact pipeline is the bit-parity run."""
    import jax
    import jax.numpy as jnp

    from sam_textvqa_tpu.config import MATRIX_TYPE_MAP
    from sam_textvqa_tpu.evaluation.metrics import decode_predictions
    from sam_textvqa_tpu.models.fast_decode import greedy_decode_fast
    from sam_textvqa_tpu.models.sa_m4c import SAM4C, SAM4CParams, greedy_decode
    from sam_textvqa_tpu.utils.checkpoint import convert_torch_state_dict

    task = _configs()
    # the checkpoint source: the reference model as torch constructs it
    sa_m4c = load_reference_sam4c(NUM_ANSWERS, bos_idx=BOS_IDX)
    torch.manual_seed(7)
    ref_model = sa_m4c.SAM4C(shim_config(task.mmt), shim_config(task.text_bert))
    state_dict = {
        k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()
    }

    model = SAM4C(params_cfg=SAM4CParams(task.mmt, task.text_bert, NUM_ANSWERS))
    batch_np = _batch(task)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    params0 = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    params, missing = convert_torch_state_dict(state_dict, params0, strict=True)
    assert not missing

    ctx_keys = sorted(
        {MATRIX_TYPE_MAP[m] for lt, m in
         zip(task.mmt.layer_type_list, task.mmt.mix_list) if lt in ("s", "i")}
    )
    tbatch = torch_batch(batch_np, ctx_keys)
    ref_model.eval()
    with torch.no_grad():
        ref_out = ref_model(tbatch)
    ref_ids = ref_out["textvqa_scores"].numpy().argmax(-1)

    _, ids_scan = greedy_decode(model, params, batch, bos_idx=BOS_IDX)
    _, ids_fast = greedy_decode_fast(model, params, batch, BOS_IDX)
    np.testing.assert_array_equal(np.asarray(ids_scan), ref_ids)
    np.testing.assert_array_equal(np.asarray(ids_fast), ref_ids)

    eos_idx = 2
    word_list = ["<pad>", "<s>", "</s>", "<unk>"] + [
        f"w{i}" for i in range(NUM_ANSWERS - 4)
    ]
    ocr_tokens = [
        [f"ocr{j}" for j in range(task.mmt.max_ocr_num)]
        for _ in range(ref_ids.shape[0])
    ]
    ours = decode_predictions(
        np.asarray(ids_fast), ocr_tokens, word_list, eos_idx
    )
    ref = decode_predictions(ref_ids, ocr_tokens, word_list, eos_idx)
    assert [a["pred_answer"] for a in ours] == [a["pred_answer"] for a in ref]
