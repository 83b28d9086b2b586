"""CLI smoke: `qie generate` end to end on the tiny byte-vocab model."""

from qwen_inference_engine_tpu.server.cli import main


def test_cli_generate_tiny(capsys):
    rc = main(["generate", "--model", "tiny", "--f32", "--greedy",
               "--prompt", "hi", "--max-new-tokens", "4",
               "--max-seq", "64", "--stats"])
    assert rc == 0
    out = capsys.readouterr()
    assert "--- sequence 0" in out.out
    assert "decode_tokens" in out.err  # --stats JSON


def test_cli_generate_tiny_quantized(capsys):
    rc = main(["generate", "--model", "tiny", "--f32", "--greedy",
               "--bits", "4", "--group-size", "16",
               "--prompt", "ok", "--max-new-tokens", "3",
               "--max-seq", "64"])
    assert rc == 0
    assert "--- sequence 0" in capsys.readouterr().out


def test_cli_generate_speculative(capsys):
    rc = main(["generate", "--model", "tiny", "--f32", "--speculative",
               "--prompt", "abab", "--max-new-tokens", "4",
               "--max-seq", "128"])
    assert rc == 0
    assert "--- sequence 0" in capsys.readouterr().out
