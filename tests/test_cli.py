"""End-to-end CLI tests (host backend, small synthetic data)."""

import numpy as np
import pytest

from vechat_tpu.io.fastx import SeqRecord, read_fastx, write_fastx
from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.pairwise import edit_distance


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def noisy(rng, s, rate=0.05):
    out = []
    for c in s:
        r = rng.random()
        if r < rate * 0.5:
            out.append(rng.choice([b for b in "ACGT" if b != c]))
        elif r < rate * 0.75:
            continue
        else:
            out.append(c)
            if rng.random() < rate * 0.25:
                out.append(rng.choice(list("ACGT")))
    return "".join(out)


@pytest.fixture
def dataset(tmp_path):
    rng = np.random.default_rng(0)
    genome = rand_seq(rng, 2500)
    reads = []
    for i in range(10):
        start = rng.integers(0, 500)
        end = min(len(genome), start + 2000)
        d = noisy(rng, genome[start:end])
        reads.append(SeqRecord(f"read{i}", d, "5" * len(d)))  # Q20
    path = tmp_path / "reads.fq"
    write_fastx(reads, path, fmt="fq")
    return genome, reads, path


def test_vechat_cli_end_to_end(dataset, tmp_path):
    from vechat_tpu.cli.vechat_main import main

    genome, reads, path = dataset
    out = tmp_path / "corrected.fa"
    rc = main(
        [
            str(path),
            "-o",
            str(out),
            "--platform",
            "ont",
            "--backend",
            "host",
        ]
    )
    assert rc == 0
    assert "LN:i:" in out.read_text()  # racon-style tags in headers
    corrected = read_fastx(out)
    assert len(corrected) > 0
    assert corrected[0].name.startswith("read") and corrected[0].name.endswith("r")

    # correction quality: corrected reads closer to genome than raw ones
    def dist_to_genome(seq):
        # align against the true window it came from (cheap containment check)
        best = min(
            edit_distance(encode(seq), encode(genome[s : s + len(seq) + 200]))
            for s in range(0, max(1, len(genome) - len(seq)), 250)
        )
        return best / len(seq)

    raw = np.mean([dist_to_genome(r.data) for r in reads[:3]])
    cor = np.mean([dist_to_genome(r.data) for r in corrected[:3]])
    assert cor < raw


def test_racon_cli(dataset, tmp_path, capsys):
    from vechat_tpu.cli.racon_main import main
    from vechat_tpu.io.paf import write_paf
    from vechat_tpu.pipeline.overlapper import (
        OverlapParams,
        filter_fpa,
        filter_length_identity,
        find_overlaps,
    )

    genome, reads, path = dataset
    ovs = find_overlaps(reads, OverlapParams(k=15, w=5))
    ovs = filter_fpa(filter_length_identity(ovs, min_block=500))
    paf = tmp_path / "ov.paf"
    write_paf(ovs, paf)

    rc = main(
        [
            str(path),
            str(paf),
            str(path),
            "-f",
            "-p",
            "-d",
            "0.2",
            "-s",
            "0.2",
            "--backend",
            "host",
        ]
    )
    assert rc == 0
    stdout = capsys.readouterr().out
    assert stdout.startswith(">read")
    assert "LN:i:" in stdout


def test_stream_mode_matches_split(dataset, tmp_path):
    """--stream (bounded-memory file-mediated chunked rounds) must produce
    byte-identical output to the in-memory --split driver."""
    from vechat_tpu.cli.vechat_main import main

    _, _, path = dataset
    out_split = tmp_path / "split.fa"
    out_stream = tmp_path / "stream.fa"
    base = [str(path), "--platform", "ont", "--backend", "host",
            "--split-size", "16"]
    assert main(base + ["-o", str(out_split), "--split"]) == 0
    assert main(base + ["-o", str(out_stream), "--stream"]) == 0
    assert out_split.read_bytes() == out_stream.read_bytes()


def test_stream_mode_resume(dataset, tmp_path):
    """--stream + --resume-dir: a rerun reuses chunk checkpoints and emits
    identical output."""
    from vechat_tpu.cli.vechat_main import main

    _, _, path = dataset
    out1 = tmp_path / "s1.fa"
    out2 = tmp_path / "s2.fa"
    rd = tmp_path / "ckpt"
    base = [str(path), "--platform", "ont", "--backend", "host",
            "--split-size", "16", "--stream", "--resume-dir", str(rd)]
    assert main(base + ["-o", str(out1)]) == 0
    assert (rd / "round1.chunk00001.rec").exists()
    assert main(base + ["-o", str(out2)]) == 0
    assert out1.read_bytes() == out2.read_bytes()


def test_corruption_guard_retries_chunk(dataset, tmp_path, monkeypatch):
    """Inter-round sanity guard (VERDICT r4 item 10): inject the r4
    worker-corruption signature (garbage consensus output) into the first
    polish pass; the guard must detect it, retry with a fresh polisher, and
    end up byte-identical to an uninjected run."""
    import vechat_tpu.cli.vechat_main as vm

    genome, reads, path = dataset

    clean_out = tmp_path / "clean.fa"
    assert vm.main([str(path), "-o", str(clean_out), "--backend", "host"]) == 0
    clean = clean_out.read_text()

    rng = np.random.default_rng(123)
    real_polisher = vm.Polisher
    fail_state = {"armed": True}

    class FaultyPolisher(real_polisher):
        def polish(self, *a, **kw):
            out = super().polish(*a, **kw)
            if fail_state["armed"]:
                # one-shot corruption: replace every corrected sequence with
                # random bases of the same length (what a degraded worker
                # emitted in r4: alignable-looking FASTA, garbage content)
                fail_state["armed"] = False
                return [
                    SeqRecord(r.name, rand_seq(rng, len(r.data)), None)
                    for r in out
                ]
            return out

    monkeypatch.setattr(vm, "Polisher", FaultyPolisher)
    guarded_out = tmp_path / "guarded.fa"
    assert vm.main([str(path), "-o", str(guarded_out), "--backend", "host"]) == 0
    assert not fail_state["armed"]  # fault actually fired
    assert guarded_out.read_text() == clean
