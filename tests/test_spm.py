"""From-scratch unigram subword trainer: model training, wire-format
round-trip through the tokenizer's parser, and CLI tools."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the quick brown fox jumps over the lazy dog",
    "she sells sea shells on the sea shore",
    "the shells she sells are sea shells",
    "cats and dogs and foxes",
    "the cat chased the quick fox",
] * 4


class TestUnigramTrainer:
    def _train(self, vocab_size=60, **kw):
        from wenet_celoss_tpu.data.spm_train import train_unigram
        return train_unigram(CORPUS, vocab_size, **kw)

    def test_vocab_size_respected(self):
        pieces = self._train(vocab_size=60)
        assert len(pieces) <= 57  # 60 - 3 control symbols
        # All corpus chars must survive as pieces (coverage 1.0).
        chars = {c for line in CORPUS for c in "▁" + line.replace(" ", "▁")}
        piece_set = {p for p, _ in pieces}
        assert chars <= piece_set

    def test_frequent_words_become_pieces(self):
        pieces = {p for p, _ in self._train(vocab_size=80)}
        assert "▁the" in pieces

    def test_scores_are_logprobs(self):
        import math
        pieces = self._train(vocab_size=60)
        assert all(s < 0 for _, s in pieces)
        total = sum(math.exp(s) for _, s in pieces)
        assert 0.5 < total <= 1.001

    def test_model_roundtrip_through_parser(self, tmp_path):
        from wenet_celoss_tpu.data.spm_train import train_unigram, \
            write_model
        from wenet_celoss_tpu.data.tokenizer import (
            UnigramTokenizer, parse_sentencepiece_model)
        pieces = train_unigram(CORPUS, 60)
        path = str(tmp_path / "m.model")
        write_model(path, pieces)
        parsed = parse_sentencepiece_model(path)
        assert set(parsed) == {p for p, _ in pieces}  # controls skipped
        for p, s in pieces:                           # float32 rounding
            assert parsed[p] == pytest.approx(s, rel=1e-6, abs=1e-4)
        tok = UnigramTokenizer(path)
        out = tok.encode("the cat sat")
        assert "".join(out).replace("▁", " ").strip() == "the cat sat"

    def test_segmentation_prefers_learned_units(self, tmp_path):
        from wenet_celoss_tpu.data.spm_train import train_unigram, \
            write_model
        from wenet_celoss_tpu.data.tokenizer import UnigramTokenizer
        pieces = train_unigram(CORPUS, 80)
        path = str(tmp_path / "m.model")
        write_model(path, pieces)
        tok = UnigramTokenizer(path)
        assert tok.encode("the") == ["▁the"]

    def test_unknown_chars_fall_back(self, tmp_path):
        from wenet_celoss_tpu.data.spm_train import train_unigram, \
            write_model
        from wenet_celoss_tpu.data.tokenizer import UnigramTokenizer
        write_model(str(tmp_path / "m.model"), train_unigram(CORPUS, 60))
        tok = UnigramTokenizer(str(tmp_path / "m.model"))
        out = tok.encode("zebra!")           # z, b, r, ! unseen or rare
        assert "".join(out).replace("▁", " ").strip() == "zebra!"

    def test_tiny_vocab_raises(self):
        with pytest.raises(ValueError):
            self._train(vocab_size=5)


@pytest.mark.slow
class TestSpmCli:
    def test_train_encode_decode_cli(self, tmp_path):
        corpus = tmp_path / "text.txt"
        corpus.write_text("\n".join(CORPUS))
        prefix = str(tmp_path / "uni")
        env = dict(os.environ, PYTHONPATH=REPO)
        res = subprocess.run(
            [sys.executable, "tools/spm_train.py", "--input", str(corpus),
             "--vocab_size", "60", "--model_prefix", prefix],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
        assert res.returncode == 0, res.stderr
        assert os.path.exists(prefix + ".model")
        assert os.path.exists(prefix + ".vocab")

        res = subprocess.run(
            [sys.executable, "tools/spm_encode.py", "--model",
             prefix + ".model"],
            input="the cat sat on the mat\n", capture_output=True,
            text=True, cwd=REPO, env=env, timeout=120)
        assert res.returncode == 0, res.stderr
        pieces_line = res.stdout.strip()
        assert pieces_line

        res = subprocess.run(
            [sys.executable, "tools/spm_decode.py", "--model",
             prefix + ".model"],
            input=pieces_line + "\n", capture_output=True, text=True,
            cwd=REPO, env=env, timeout=120)
        assert res.returncode == 0, res.stderr
        assert res.stdout.strip() == "the cat sat on the mat"

    def test_trained_model_drives_tokenizer_class(self, tmp_path):
        """A trained model plugs into data.tokenizer.Tokenizer (the
        training-pipeline consumer, reference processor.py tokenize)."""
        from wenet_celoss_tpu.data.spm_train import train_unigram, \
            write_model
        from wenet_celoss_tpu.data.tokenizer import Tokenizer
        path = str(tmp_path / "m.model")
        write_model(path, train_unigram(CORPUS, 80))
        table = {"<blank>": 0, "<unk>": 1, "▁the": 2, "▁cat": 3}
        tok = Tokenizer(table, bpe_model=path)
        tokens, ids = tok("the cat")
        assert tokens[0] == "▁the"
        assert ids[0] == 2


class TestMakeContextList:
    """tools/make_context_list.py (proper CLI replacing the reference's
    examples/librispeech/s0/generate_dic_mode3.py)."""

    def _units(self, tmp_path):
        units = tmp_path / "units.txt"
        units.write_text("<blank> 0\n<unk> 1\nh 2\ne 3\nl 4\no 5\nw 6\n"
                         "r 7\nd 8\n▁ 9\n")
        return str(units)

    def test_phrase_list_mode(self, tmp_path):
        import subprocess, sys
        ctx = tmp_path / "hotwords.txt"
        ctx.write_text("hello\nworld\n\nhew\n")
        out = tmp_path / "ctx_ids.txt"
        res = subprocess.run(
            [sys.executable, "tools/make_context_list.py",
             "--context_file", str(ctx), "--symbol_table",
             self._units(tmp_path), "--output", str(out)],
            capture_output=True, text=True, cwd=REPO, timeout=120)
        assert res.returncode == 0, res.stderr
        lines = out.read_text().splitlines()
        assert lines[0] == "2 3 4 4 5"       # h e l l o
        assert lines[1] == "6 5 7 4 8"       # w o r l d
        assert len(lines) == 3

    def test_per_utt_dict_mode(self, tmp_path):
        import pickle, subprocess, sys
        ctx = tmp_path / "per_utt.tsv"
        ctx.write_text("utt1\thello\tworld\nutt2\thew\n")
        out = tmp_path / "ctx.dic"
        res = subprocess.run(
            [sys.executable, "tools/make_context_list.py",
             "--context_file", str(ctx), "--symbol_table",
             self._units(tmp_path), "--per_utt", "--output", str(out)],
            capture_output=True, text=True, cwd=REPO, timeout=120)
        assert res.returncode == 0, res.stderr
        dic = pickle.load(open(out, "rb"))
        assert dic["utt1"] == [[2, 3, 4, 4, 5], [6, 5, 7, 4, 8]]
        assert dic["utt2"] == [[2, 3, 6]]
