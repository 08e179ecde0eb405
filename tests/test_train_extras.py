"""Tests: image-codec trainer, semantic trainer, checkpointing, importers,
data pipelines."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvc_tpu.core.config import TrainConfig
from deepsvc_tpu.data import make_clip_batch
from deepsvc_tpu.models import ImageCodec, PFrameCodec, ResNetTeacher, StudentBackbone
from deepsvc_tpu.train import ImageCodecTrainer, ImageTrainConfig, SemanticPFrameTrainer
from deepsvc_tpu.train.trainer import TrainState


class TestImageCodecTrainer:
    @pytest.mark.slow
    def test_loss_decreases(self, rng):
        cfg = ImageTrainConfig(lmbda=0.0483)
        model = ImageCodec(N=32, M=40, num_slices=4, max_support_slices=2)
        tr = ImageCodecTrainer(cfg, model=model, init_shape=(64, 64))
        batch = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
        losses = [tr.train_batch(batch)["loss"] for _ in range(6)]
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]


class TestSemanticTrainer:
    @pytest.mark.slow
    def test_one_step(self, rng):
        cfg = TrainConfig(batch_size=1, stage_steps=(4, 8, 12, 16, 20),
                          frames_per_stage=(2, 2, 2, 2))
        p_model = PFrameCodec(mv_latent=16, res_latent=16)
        i_model = ImageCodec(N=32, M=40, num_slices=4, max_support_slices=2)
        x0 = jnp.zeros((1, 64, 64, 3))
        i_vars = i_model.init({"params": jax.random.PRNGKey(0)}, x0,
                              rng=jax.random.PRNGKey(1))
        teacher = ResNetTeacher(out_indices=(0,))
        t_vars = teacher.init(jax.random.PRNGKey(0), x0)
        student = StudentBackbone(N=16, out_indices=(0,))
        supp0 = jnp.zeros((2, 1, 16, 16, 256))
        s_vars = student.init({"params": jax.random.PRNGKey(0)}, x0, supp0,
                              rng=jax.random.PRNGKey(1))

        tr = SemanticPFrameTrainer(
            cfg, p_model,
            i_codec=(i_model, i_vars),
            teacher=(teacher, t_vars),
            student=(student, s_vars),
            init_shape=(64, 64),
        )
        assert int(tr.state.step) == cfg.stage_steps[3]  # fine-tune start
        frames = jnp.asarray(make_clip_batch(rng, frames=2, batch=1,
                                             height=64, width=64))
        m = tr.train_batch(frames)
        assert np.isfinite(m["loss"])


class TestCheckpointing:
    def test_save_restore_roundtrip(self, tmp_path, rng):
        from deepsvc_tpu.train import make_optimizer
        from deepsvc_tpu.utils.checkpoint import CheckpointManager

        params = {"w": jnp.asarray(rng.random((4, 4), dtype=np.float32)),
                  "quantiles": jnp.zeros((3,))}
        tx = make_optimizer(params)
        state = TrainState.create(params, tx, jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(7, state)
        template = TrainState.create(
            jax.tree_util.tree_map(jnp.zeros_like, params), tx, jax.random.PRNGKey(1)
        )
        restored, step = mgr.restore(template)
        assert step == 7
        np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                      np.asarray(state.params["w"]))


class TestTrainEvalCheckpointContract:
    @pytest.mark.slow  # 55s cold (builds PFrameRuntime via build_runtimes)
    def test_main_save_then_eval_restore(self, tmp_path, rng):
        """The TrainState main.py saves must load through
        test_video_tpu.build_runtimes' restore path (ADVICE r1)."""
        import argparse

        from deepsvc_tpu.models import init_pframe_variables
        from deepsvc_tpu.train import make_optimizer
        from deepsvc_tpu.utils.checkpoint import CheckpointManager

        # trainer side (main.py --tiny layout)
        model = PFrameCodec(mv_latent=16, res_latent=16)
        p_vars = init_pframe_variables(model, jax.random.PRNGKey(3), H=64, W=64)
        tx = make_optimizer(p_vars)
        state = TrainState.create(p_vars, tx, jax.random.PRNGKey(0))
        run_dir = tmp_path / "mse_640"
        mgr = CheckpointManager(str(run_dir / "checkpoints"))
        mgr.save(11, state)

        # eval side
        import test_video_tpu as tv

        args = argparse.Namespace(
            checkpoint_root=str(tmp_path), metric="mse", smoke=True,
            no_semantic=True,
        )
        _, p_rt, _, _ = tv.build_runtimes(args, 640)
        got = jax.tree_util.tree_leaves(p_rt.variables)
        want = jax.tree_util.tree_leaves(p_vars)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


class TestTorchImport:
    @pytest.mark.slow  # 8.4s: cold torch import dominates
    def test_convert_resnet50_state_dict(self):
        import torch

        # synthesize a minimal torchvision-shaped state dict
        sd = {"conv1.weight": torch.randn(64, 3, 7, 7) * 0.05}
        for k in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn1.{k}"] = torch.randn(64).abs() + 0.1
        blocks = (3, 4, 6, 3)
        for li, nb in enumerate(blocks, start=1):
            cin = 64 if li == 1 else 64 * 2 ** (li - 2) * 4
            planes = 64 * 2 ** (li - 1)
            for b in range(nb):
                dims = [(planes, cin if b == 0 else planes * 4, 1),
                        (planes, planes, 3), (planes * 4, planes, 1)]
                for ci, (o, i, k) in enumerate(dims, start=1):
                    sd[f"layer{li}.{b}.conv{ci}.weight"] = torch.randn(o, i, k, k) * 0.02
                    for kk in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"layer{li}.{b}.bn{ci}.{kk}"] = torch.randn(o).abs() + 0.1
                if b == 0:
                    sd[f"layer{li}.{b}.downsample.0.weight"] = (
                        torch.randn(planes * 4, cin, 1, 1) * 0.02
                    )
                    for kk in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"layer{li}.{b}.downsample.1.{kk}"] = (
                            torch.randn(planes * 4).abs() + 0.1
                        )

        from deepsvc_tpu.utils.torch_import import convert_resnet50

        variables = convert_resnet50(sd)
        m = ResNetTeacher()
        x = jnp.zeros((1, 64, 64, 3))
        # structural match: imported tree must slot straight into the module
        out = m.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x,
        )
        assert out[-1].shape == (1, 4, 4, 2048)
        assert np.isfinite(np.asarray(out[-1])).all()


class TestVimeoPipeline:
    def test_clip_loading_and_batching(self, tmp_path, rng):
        from PIL import Image

        from deepsvc_tpu.data.vimeo import VimeoClips, VimeoConfig

        root = tmp_path / "vimeo"
        seqs = ["00001/0001", "00001/0002", "00002/0001"]
        for s in seqs:
            d = root / "sequences" / s
            d.mkdir(parents=True)
            for i in range(1, 8):
                arr = (rng.random((64, 112, 3)) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"im{i}.png")
        (root / "sep_trainlist.txt").write_text("\n".join(seqs) + "\n")

        cfg = VimeoConfig(root=str(root), crop=48, use_coded_iframe=False)
        clips = VimeoClips(cfg)
        assert len(clips) == 3
        clip = clips.load_clip(0)
        assert clip.shape == (7, 48, 48, 3)
        batches = list(clips.batches(batch_size=2))
        assert batches[0].shape == (7, 2, 48, 48, 3)

    def test_return_orgi_pairing(self, tmp_path, rng):
        """VimeoDataset1 `return_orgi` parity (dataset.py:231-285): clips
        lead with [original im1, AI-coded im1_1], then im2..imN, under one
        joint transform."""
        from PIL import Image

        from deepsvc_tpu.data.vimeo import VimeoClips, VimeoConfig

        root = tmp_path / "vimeo"
        s = "00001/0001"
        d = root / "sequences" / s
        d.mkdir(parents=True)
        for i in range(1, 8):
            arr = np.full((64, 112, 3), i * 10, dtype=np.uint8)
            Image.fromarray(arr).save(d / f"im{i}.png")
        coded = root / "ICIP2020_i_mse" / s
        coded.mkdir(parents=True)
        Image.fromarray(np.full((64, 112, 3), 200, np.uint8)).save(coded / "im1_1.png")
        (root / "sep_trainlist.txt").write_text(s + "\n")

        cfg = VimeoConfig(root=str(root), crop=48, return_orgi=True)
        clips = VimeoClips(cfg)
        paths = clips._frame_paths(clips.dirs[0])
        assert paths[0].endswith("sequences/00001/0001/im1.png")
        assert paths[1].endswith("ICIP2020_i_mse/00001/0001/im1_1.png")
        assert paths[2].endswith("im2.png")
        clip = clips.load_clip(0, augment=False)
        assert clip.shape == (8, 48, 48, 3)  # max_frames + 1
        # frame 0 = original (10/255), frame 1 = coded stand-in (200/255)
        assert abs(float(clip[0].mean()) - 10 / 255) < 1e-3
        assert abs(float(clip[1].mean()) - 200 / 255) < 1e-3

    def test_vid_paths(self, tmp_path):
        from deepsvc_tpu.data.vid import VIDClips, VIDConfig

        root = tmp_path / "vidroot"
        (root / "VID").mkdir(parents=True)
        (root / "VID" / "train.txt").write_text(
            "Data/VID/a/000000.JPEG\nData/VID/b/000004.JPEG\n"
        )
        clips = VIDClips(VIDConfig(root=str(root)))
        paths = clips._frame_paths(clips.entries[0])
        assert paths[0].endswith("bpg/000000_bpg444_QP27.JPEG")
        assert paths[1].endswith("000001.JPEG")
        paths = clips._frame_paths(clips.entries[1])
        assert paths[0].endswith("bpg/000004_bpg444_QP27.JPEG")
        assert paths[-1].endswith("000008.JPEG")
