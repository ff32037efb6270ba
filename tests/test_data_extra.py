"""Tests for wav distortion, kaldi IO, and the context filter."""

import io
import os
import random

import numpy as np
import pytest

from wenet_celoss_tpu.data import kaldi_io, wav_distortion
from wenet_celoss_tpu.decode.context_filter import (
    ContextFilter, posterior_phrase_scores)


class TestWavDistortion:
    def test_max_distortion(self):
        x = np.array([0.5, -0.5, 0.0], np.float32)
        y = wav_distortion.distort_max(x)
        np.testing.assert_allclose(y, [0.997, -0.997, 0.0])

    def test_quad_preserves_sign_and_range(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(1000) * 0.3).astype(np.float32)
        y = wav_distortion.distort_quad(x)
        assert np.all(np.abs(y) <= 1.0)
        nz = np.abs(x) > 1e-6
        assert np.all(np.sign(y[nz]) == np.sign(x[nz]))

    def test_jag_and_fence(self):
        rng = np.random.default_rng(1)
        x = (rng.standard_normal(500) * 0.5).astype(np.float32)
        rnd = random.Random(0)
        y = wav_distortion.distort_jag(x, rng=rnd)
        kept = y != 0
        np.testing.assert_allclose(y[kept], x[kept])
        z = wav_distortion.distort_fence(x, max_db=-6.0, rng=rnd)
        max_amp = float(wav_distortion.db2amp(-6.0))
        for v in np.unique(np.abs(z)):
            assert abs(v) < 1e-6 or abs(v - max_amp) < 1e-4

    def test_registry(self):
        x = np.zeros(10, np.float32)
        for name in wav_distortion.DISTORTIONS:
            out = wav_distortion.distort_wav(x, name)
            assert out.shape == x.shape


class TestKaldiIO:
    def test_mat_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        m1 = rng.standard_normal((5, 13)).astype(np.float32)
        m2 = rng.standard_normal((3, 13)).astype(np.float32)
        ark = tmp_path / "feats.ark"
        scp_lines = []
        with open(ark, "wb") as f:
            off1 = kaldi_io.write_mat(f, m1, key="u1")
            scp_lines.append(f"u1 {ark}:{off1}")
            off2 = kaldi_io.write_mat(f, m2, key="u2")
            scp_lines.append(f"u2 {ark}:{off2}")
        # ark iteration
        items = dict(kaldi_io.read_ark(str(ark)))
        np.testing.assert_allclose(items["u1"], m1)
        np.testing.assert_allclose(items["u2"], m2)
        # scp indexed access
        scp = tmp_path / "feats.scp"
        scp.write_text("\n".join(scp_lines))
        items2 = dict(kaldi_io.read_scp(str(scp)))
        np.testing.assert_allclose(items2["u2"], m2)

    def test_compressed_mat_roundtrip(self, tmp_path):
        """CM/CM2/CM3 write → read lands within one quantization step."""
        rng = np.random.default_rng(3)
        m = (rng.standard_normal((17, 9)) * 4.0).astype(np.float32)
        for fmt, tol in (("CM", None), ("CM2", None), ("CM3", None)):
            p = tmp_path / f"{fmt}.ark"
            with open(p, "wb") as f:
                kaldi_io.write_cmat(f, m, key="u", fmt=fmt)
            items = dict(kaldi_io.read_ark(str(p)))
            got = items["u"]
            assert got.shape == m.shape
            grange = float(m.max() - m.min())
            step = {"CM2": grange / 65535.0, "CM3": grange / 255.0,
                    "CM": grange / 63.0}[fmt]
            np.testing.assert_allclose(got, m, atol=step * 1.01)

    def test_compressed_mat_matches_reference_reader(self, tmp_path):
        """The reference's own kaldi_io decodes our CM ark to the exact
        same floats (byte-level format compatibility, reference
        wenet/dataset/kaldi_io.py:431-480)."""
        ref_path = "/root/reference/wenet/dataset/kaldi_io.py"
        if not os.path.exists(ref_path):
            pytest.skip("reference tree not mounted")
        import importlib.util
        spec = importlib.util.spec_from_file_location("ref_kaldi_io",
                                                      ref_path)
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        rng = np.random.default_rng(5)
        m = (rng.standard_normal((23, 7)) * 3.0).astype(np.float32)
        p = tmp_path / "cm.ark"
        with open(p, "wb") as f:
            kaldi_io.write_cmat(f, m, key="u", fmt="CM")
        ours = dict(kaldi_io.read_ark(str(p)))["u"]
        with open(p, "rb") as f:
            key = b""
            while (c := f.read(1)) != b" ":
                key += c
            theirs = ref.read_mat(f)
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-6)

    def test_vec_roundtrip(self, tmp_path):
        v = np.arange(7, dtype=np.float32)
        p = tmp_path / "v.ark"
        with open(p, "wb") as f:
            kaldi_io.write_vec_flt(f, v)
        with open(p, "rb") as f:
            got = kaldi_io.read_vec_flt(f)
        np.testing.assert_allclose(got, v)

    def test_text_matrix(self, tmp_path):
        p = tmp_path / "t.mat"
        p.write_text(" [\n  1 2 3\n  4 5 6 ]\n")
        m = kaldi_io.read_mat(str(p))
        np.testing.assert_allclose(m, [[1, 2, 3], [4, 5, 6]])


class TestContextFilter:
    def _posterior(self, seq, v=6, t_per=3, boost=5.0):
        """Posterior that strongly supports `seq` in order."""
        t = len(seq) * t_per
        post = np.full((t, v), -10.0, np.float32)
        for i, tok in enumerate(seq):
            post[i * t_per:(i + 1) * t_per, tok] = boost
        return post

    def test_posterior_filter_ranks_present_phrase(self):
        ctx = np.array([[0, 0], [2, 3], [4, 5]], np.int32)
        lens = np.array([1, 2, 2], np.int32)
        post = self._posterior([2, 3])
        scores = posterior_phrase_scores(post, ctx, lens)
        assert scores[1] > scores[2]

    def test_second_filter_shortlist(self):
        ctx = np.array([[0, 0], [2, 3], [4, 5], [3, 2]], np.int32)
        lens = np.array([1, 2, 2, 2], np.int32)
        f = ContextFilter(ctx, lens, window_size=8, topk_first=3,
                          topk_second=0.0)
        post = self._posterior([2, 3], t_per=4)
        f.posterior_filter(post)
        res, res_lens = f.second_filter(post)
        # Sentinel first, then the matching phrase [2, 3].
        assert res_lens[0] == 1
        assert [int(x) for x in res[1]] == [2, 3]
        # Absent phrase [4,5] filtered out by threshold.
        assert all([int(x) for x in r] != [4, 5] for r in res[1:])


class TestPipelineParallelism:
    def test_parallel_map_preserves_order(self):
        from wenet_celoss_tpu.data.processor import parallel_map
        import time as _time

        def slow_sq(x):
            _time.sleep(0.001 * (x % 3))
            return x * x

        out = list(parallel_map(iter(range(50)), slow_sq, num_workers=4))
        assert out == [i * i for i in range(50)]

    def test_prefetch_yields_all_and_propagates_errors(self):
        from wenet_celoss_tpu.data.processor import prefetch
        assert list(prefetch(iter(range(20)), 3)) == list(range(20))

        def boom():
            yield 1
            raise RuntimeError("pipeline error")

        it = prefetch(boom(), 2)
        assert next(it) == 1
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="pipeline error"):
            next(it)

    def test_dataset_num_workers_matches_serial(self, tmp_path):
        """num_workers>0 produces identical batches to the serial path."""
        import json
        import numpy as np
        from wenet_celoss_tpu.data.dataset import Dataset
        from wenet_celoss_tpu.data.wav import write_wav
        rng = np.random.default_rng(0)
        lines = []
        for i in range(6):
            wav = (rng.standard_normal(3200) * 1000).astype(np.float32)
            p = tmp_path / f"w{i}.wav"
            write_wav(p, wav, 16000)
            lines.append(json.dumps(
                {"key": f"u{i}", "wav": str(p), "txt": "AB"}))
        (tmp_path / "data.list").write_text("\n".join(lines))
        syms = {"<blank>": 0, "A": 1, "B": 2, "<sos/eos>": 3}
        base_conf = {
            "filter": False, "shuffle": False, "sort": False,
            "fbank_conf": {"num_mel_bins": 23},
            "batch_conf": {"batch_type": "static", "batch_size": 3},
        }
        serial = list(iter(Dataset("raw", str(tmp_path / "data.list"),
                                   syms, dict(base_conf, prefetch=0))))
        par = list(iter(Dataset("raw", str(tmp_path / "data.list"),
                                syms, dict(base_conf, num_workers=4,
                                           prefetch=2))))
        assert len(serial) == len(par) == 2
        for a, b in zip(serial, par):
            assert a["keys"] == b["keys"]
            np.testing.assert_array_equal(a["feats"], b["feats"])
            np.testing.assert_array_equal(a["labels"], b["labels"])


class TestDataDirTool:
    """tools/data_dir.py — kaldi-style data-dir utilities (reference
    tools/fix_data_dir.sh, subset_data_dir.sh, combine_data.sh,
    perturb_data_dir_speed.sh, filter_scp.pl, utt2spk_to_spk2utt.pl)."""

    def _make_dir(self, root, n=6, spk_every=2):
        import os
        os.makedirs(root, exist_ok=True)
        with open(root / "wav.scp", "w") as w, \
                open(root / "text", "w") as t, \
                open(root / "utt2spk", "w") as u:
            for i in range(n):
                w.write(f"utt{i} /path/{i}.wav\n")
                t.write(f"utt{i} hello {i}\n")
                u.write(f"utt{i} spk{i // spk_every}\n")
        return root

    def _run(self, *args):
        import os
        import subprocess
        import sys
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        return subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "data_dir.py")]
            + [str(a) for a in args],
            capture_output=True, text=True)

    def test_validate_fix(self, tmp_path):
        d = self._make_dir(tmp_path / "d")
        assert self._run("validate", d).returncode == 0
        # Break consistency: drop one utt from text only.
        lines = (d / "text").read_text().splitlines()
        (d / "text").write_text("\n".join(lines[:-1]) + "\n")
        assert self._run("validate", d).returncode == 1
        assert self._run("fix", d).returncode == 0
        assert self._run("validate", d).returncode == 0
        assert len((d / "wav.scp").read_text().splitlines()) == 5
        assert (d / "spk2utt").exists()

    def test_subset_and_combine(self, tmp_path):
        d = self._make_dir(tmp_path / "d")
        r = self._run("subset", d, tmp_path / "s1", "--num", 2, "--first")
        assert r.returncode == 0, r.stderr
        assert len((tmp_path / "s1" / "text").read_text().splitlines()) == 2
        # spk subset
        (tmp_path / "spks").write_text("spk0\n")
        self._run("subset", d, tmp_path / "s2",
                  "--spk-list", tmp_path / "spks")
        utts = [ln.split()[0] for ln in
                (tmp_path / "s2" / "utt2spk").read_text().splitlines()]
        assert utts == ["utt0", "utt1"]
        r = self._run("combine", tmp_path / "c", tmp_path / "s1",
                      tmp_path / "s2")
        assert r.returncode == 0, r.stderr
        assert self._run("validate", tmp_path / "c").returncode == 0

    def test_filter_scp_and_spk_maps(self, tmp_path):
        d = self._make_dir(tmp_path / "d")
        (tmp_path / "ids").write_text("utt1\nutt3\n")
        r = self._run("filter-scp", tmp_path / "ids", d / "wav.scp")
        assert [ln.split()[0] for ln in r.stdout.splitlines()] == \
            ["utt1", "utt3"]
        r = self._run("filter-scp", "--exclude", tmp_path / "ids",
                      d / "wav.scp")
        assert len(r.stdout.splitlines()) == 4
        self._run("spk2utt-to-utt2spk", d)
        assert self._run("validate", d).returncode == 0

    def test_remove_dup_utts(self, tmp_path):
        d = self._make_dir(tmp_path / "d")
        (d / "text").write_text(
            "".join(f"utt{i} same words\n" for i in range(6)))
        self._run("remove-dup-utts", d, "--max-count", 2)
        assert len((d / "text").read_text().splitlines()) == 2
        assert self._run("validate", d).returncode == 0

    def test_perturb_speed_end_to_end(self, tmp_path):
        """perturb-speed dir → make_raw_list → Dataset loads a
        speed-changed waveform of the right length."""
        import json
        import os
        import subprocess
        import sys

        import numpy as np

        from wenet_celoss_tpu.data.dataset import Dataset
        from wenet_celoss_tpu.data.wav import write_wav

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        d = tmp_path / "d"
        os.makedirs(d)
        wav_path = tmp_path / "a.wav"
        write_wav(wav_path, np.zeros(16000, np.float32) + 50.0, 16000)
        (d / "wav.scp").write_text(f"utt0 {wav_path}\n")
        (d / "text").write_text("utt0 a\n")
        r = self._run("perturb-speed", d, tmp_path / "sp", "--speed", 0.9)
        assert r.returncode == 0, r.stderr
        sp = tmp_path / "sp"
        assert "sp0.9-utt0" in (sp / "wav.scp").read_text()
        subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "make_raw_list.py"),
             str(sp / "wav.scp"), str(sp / "text"),
             str(tmp_path / "data.list")], check=True)
        obj = json.loads((tmp_path / "data.list").read_text())
        assert obj["speed"] == 0.9 and obj["key"] == "sp0.9-utt0"
        ds = Dataset("raw", str(tmp_path / "data.list"),
                     {"a": 1, "<blank>": 0},
                     {"filter": False, "shuffle": False, "sort": False,
                      "fbank_conf": {"num_mel_bins": 23},
                      "batch_conf": {"batch_size": 1}, "prefetch": 0})
        batch = next(iter(ds))
        # 0.9x speed → 1/0.9 ≈ 1.111x samples → more frames than 1.0x.
        assert int(batch["feat_lengths"][0]) > 98

    def test_segments_in_make_raw_list(self, tmp_path):
        import json
        import os
        import subprocess
        import sys

        import numpy as np

        from wenet_celoss_tpu.data import processor
        from wenet_celoss_tpu.data.wav import write_wav

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        wav_path = tmp_path / "rec.wav"
        write_wav(wav_path, np.arange(16000, dtype=np.float32) % 100, 16000)
        (tmp_path / "wav.scp").write_text(f"rec0 {wav_path}\n")
        (tmp_path / "text").write_text("seg0 a\nseg1 a\n")
        (tmp_path / "segments").write_text(
            "seg0 rec0 0.0 0.25\nseg1 rec0 0.25 1.0\n")
        subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "make_raw_list.py"),
             str(tmp_path / "wav.scp"), str(tmp_path / "text"),
             str(tmp_path / "data.list"),
             "--segments", str(tmp_path / "segments")], check=True)
        lines = (tmp_path / "data.list").read_text().splitlines()
        assert len(lines) == 2
        objs = [json.loads(ln) for ln in lines]
        samples = list(processor.parse_raw(
            iter([{"src": ln} for ln in lines])))
        assert len(samples[0]["wav"]) == 4000
        assert len(samples[1]["wav"]) == 12000
        assert objs[0]["start"] == 0.0 and objs[1]["end"] == 1.0
