"""CLI end-to-end tests, mirroring the reference shell-test matrix
(programs/Makefile:159-250): round-trips at every -B, -BD, sparse files,
--content-size, frame concatenation, multi-file, pass-through, legacy,
stdin/stdout pipes, and interop with the reference CLI binary."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from lz4_tpu.utils.datagen import gen_buffer, incompressible

from . import oracle

REPO = Path(__file__).resolve().parent.parent


def run_cli(args, input_=None, cwd=None, name="lz4t"):
    env = dict(os.environ)
    env["LZ4TPU_FORCE_CPU"] = "1"
    # keep -b tests fast: shrink the reference protocol's >=2s windows
    env.setdefault("LZ4T_BENCH_SECONDS", "0.05")
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "lz4_tpu.cli"]
    p = subprocess.run(cmd + list(args), input=input_, capture_output=True,
                       cwd=cwd, env=env, timeout=300)
    return p


DATA = gen_buffer(150_000, 0.7, 800)


def test_roundtrip_file(tmp_path):
    src = tmp_path / "file.bin"
    src.write_bytes(DATA)
    assert run_cli(["-z", str(src)]).returncode == 0
    lz4f = tmp_path / "file.bin.lz4"
    assert lz4f.exists()
    out = tmp_path / "out.bin"
    assert run_cli(["-d", str(lz4f), str(out)]).returncode == 0
    assert out.read_bytes() == DATA


@pytest.mark.parametrize("bs", ["-B4", "-B5", "-B6", "-B7"])
def test_block_sizes(tmp_path, bs):
    src = tmp_path / "f"
    src.write_bytes(DATA)
    assert run_cli([bs, "-z", "-f", str(src)]).returncode == 0
    p = run_cli(["-d", "-c", str(src) + ".lz4"])
    assert p.returncode == 0 and p.stdout == DATA


def test_block_dependency_improves_ratio(tmp_path):
    src = tmp_path / "f"
    src.write_bytes(DATA)
    run_cli(["-B4", "-z", "-f", str(src), str(src) + ".indep"])
    run_cli(["-B4", "-BD", "-z", "-f", str(src), str(src) + ".linked"])
    indep = (tmp_path / "f.indep").stat().st_size
    linked = (tmp_path / "f.linked").stat().st_size
    assert linked <= indep
    p = run_cli(["-d", "-c", str(src) + ".linked"])
    assert p.stdout == DATA


def test_stdin_stdout_pipe():
    p = run_cli(["-z", "-c"], input_=DATA)
    assert p.returncode == 0, p.stderr
    q = run_cli(["-d"], input_=p.stdout)
    assert q.returncode == 0 and q.stdout == DATA


def test_levels(tmp_path):
    src = tmp_path / "f"
    src.write_bytes(DATA[:30_000])
    sizes = {}
    for lv in ("-1", "-9"):
        p = run_cli([lv, "-z", "-c", str(src)])
        assert p.returncode == 0
        sizes[lv] = len(p.stdout)
        q = run_cli(["-d"], input_=p.stdout)
        assert q.stdout == DATA[:30_000]
    assert sizes["-9"] <= sizes["-1"]


def test_test_mode(tmp_path):
    src = tmp_path / "f"
    src.write_bytes(DATA)
    run_cli(["-z", str(src)])
    assert run_cli(["-t", str(src) + ".lz4"]).returncode == 0
    # corrupt it
    blob = bytearray((tmp_path / "f.lz4").read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    (tmp_path / "bad.lz4").write_bytes(bytes(blob))
    assert run_cli(["-t", str(tmp_path / "bad.lz4")]).returncode != 0


def test_content_size_and_no_frame_crc(tmp_path):
    src = tmp_path / "f"
    src.write_bytes(DATA[:5000])
    p = run_cli(["--content-size", "--no-frame-crc", "-z", "-c", str(src)])
    from lz4_tpu.frame import get_frame_info
    info = get_frame_info(p.stdout[:15])
    assert info.content_size == 5000
    assert not info.content_checksum


def test_multi_file(tmp_path):
    paths = []
    for i in range(3):
        f = tmp_path / f"f{i}"
        f.write_bytes(gen_buffer(10_000, 0.6, i))
        paths.append(str(f))
    assert run_cli(["-m", "-z", *paths]).returncode == 0
    for i, p in enumerate(paths):
        assert Path(p + ".lz4").exists()
        Path(p).unlink()
    assert run_cli(["-m", "-d", *(p + ".lz4" for p in paths)]).returncode == 0
    for i, p in enumerate(paths):
        assert Path(p).read_bytes() == gen_buffer(10_000, 0.6, i)


def test_legacy_format(tmp_path):
    src = tmp_path / "f"
    src.write_bytes(DATA[:40_000])
    p = run_cli(["-l", "-z", "-c", str(src)])
    assert p.stdout[:4] == b"\x02\x21\x4c\x18"
    q = run_cli(["-d"], input_=p.stdout)
    assert q.stdout == DATA[:40_000]


def test_concatenated_frames(tmp_path):
    p1 = run_cli(["-z", "-c"], input_=DATA[:1000]).stdout
    p2 = run_cli(["-z", "-c"], input_=DATA[1000:3000]).stdout
    q = run_cli(["-d"], input_=p1 + p2)
    assert q.stdout == DATA[:3000]


def test_sparse_decode(tmp_path):
    sparse_data = (b"head" + b"\x00" * 1_000_000 + b"tail"
                   + b"\x00" * 500_000)
    src = tmp_path / "f"
    src.write_bytes(sparse_data)
    run_cli(["-z", "-f", str(src)])
    out = tmp_path / "restored"
    assert run_cli(["-d", str(src) + ".lz4", str(out)]).returncode == 0
    assert out.read_bytes() == sparse_data
    # holes were actually seeked over (fewer blocks than apparent size)
    st = out.stat()
    assert st.st_blocks * 512 < len(sparse_data) // 2


def test_refuses_overwrite_without_f(tmp_path):
    src = tmp_path / "f"
    src.write_bytes(b"x" * 100)
    (tmp_path / "f.lz4").write_bytes(b"occupied")
    assert run_cli(["-z", str(src)]).returncode != 0
    assert run_cli(["-z", "-f", str(src)]).returncode == 0


def test_version_and_help():
    assert b"tpu-lz4" in run_cli(["-V"]).stdout
    assert b"Usage" in run_cli(["-h"]).stdout


@pytest.mark.skipif(not oracle.available(), reason="no reference oracle")
def test_interop_with_reference_cli(tmp_path):
    cli = oracle.build_cli()
    if cli is None:
        pytest.skip("reference CLI not buildable")
    src = tmp_path / "f"
    src.write_bytes(DATA)
    # ours -> reference
    run_cli(["-z", "--content-size", "-f", str(src)])
    p = subprocess.run([str(cli), "-d", "-c", str(src) + ".lz4"],
                       capture_output=True, timeout=120)
    assert p.returncode == 0 and p.stdout == DATA
    # reference -> ours (with HC level and linked blocks)
    ref_out = tmp_path / "ref.lz4"
    subprocess.run([str(cli), "-9", "-B5", "-BD", "-f", str(src),
                    str(ref_out)], capture_output=True, timeout=120)
    q = run_cli(["-d", "-c", str(ref_out)])
    assert q.returncode == 0 and q.stdout == DATA
    # legacy produced by reference
    subprocess.run([str(cli), "-l", "-f", str(src), str(tmp_path / "l.lz4")],
                   capture_output=True, timeout=120)
    r = run_cli(["-d", "-c", str(tmp_path / "l.lz4")])
    assert r.returncode == 0 and r.stdout == DATA
    # our legacy decoded by reference
    s = run_cli(["-l", "-z", "-c"], input_=DATA)
    t = subprocess.run([str(cli), "-d", "-c"], input=s.stdout,
                       capture_output=True, timeout=120)
    assert t.returncode == 0 and t.stdout == DATA


def test_bench_mode(tmp_path):
    src = tmp_path / "f"
    src.write_bytes(DATA[:100_000])
    p = run_cli(["-b1", "-i1", str(src)])
    assert p.returncode == 0, p.stderr
    assert b"MB/s" in p.stdout


def test_block_dependency_flag_roundtrip(tmp_path):
    """-BD emits a linked frame (device chain path) that we and the
    reference CLI both decode."""
    import subprocess, sys
    src = tmp_path / "in.bin"
    data = (gen_buffer(70000, 0.7, 31) + b"Z" * 5000) * 3
    src.write_bytes(data)
    out = tmp_path / "in.bin.lz4"
    r = run_cli(["-BD", "-f", str(src), str(out)])
    assert r.returncode == 0, r.stderr
    from lz4_tpu.frame import decode_frame_header
    frame = out.read_bytes()
    assert not decode_frame_header(frame).block_independent
    back = tmp_path / "back.bin"
    r = run_cli(["-d", "-f", str(out), str(back)])
    assert r.returncode == 0, r.stderr
    assert back.read_bytes() == data


def test_pass_through_forced_decompress(tmp_path):
    """-d -f on non-LZ4 input copies it verbatim (lz4io.c:946-952 gated on
    g_overwrite; shell analog programs/Makefile:249-250)."""
    src = tmp_path / "plain.txt"
    payload = b"just some text, not lz4 at all\n" * 10
    src.write_bytes(payload)
    out = tmp_path / "out.bin"
    # without -f: refuse
    p = run_cli(["-d", str(src), str(out)])
    assert p.returncode != 0
    # with -f: verbatim copy
    p = run_cli(["-d", "-f", str(src), str(out)])
    assert p.returncode == 0, p.stderr
    assert out.read_bytes() == payload
    # lz4cat personality (overwrite implied) also passes through
    q = run_cli(["-d", "-f", "-c", str(src)])
    assert q.returncode == 0 and q.stdout == payload


def test_trailing_garbage_after_stream_stops_cleanly():
    """Valid stream followed by unrecognized data decodes the stream and
    stops without error (lz4io.c:948-952)."""
    comp = run_cli(["-z", "-c"], input_=DATA).stdout
    p = run_cli(["-d", "-c"], input_=comp + b"#garbage-not-a-frame")
    assert p.returncode == 0, p.stderr
    assert p.stdout == DATA


def test_bd_small_input_keeps_linked_flag():
    """-BD on data <= one block still emits FLG blockMode=linked, matching
    the reference CLI (lz4io.c:138); content decodes either way."""
    from lz4_tpu.frame import decode_frame_header
    small = DATA[:30_000]
    p = run_cli(["-B4", "-BD", "-z", "-c"], input_=small)
    assert p.returncode == 0, p.stderr
    assert not decode_frame_header(p.stdout).block_independent
    q = run_cli(["-d", "-c"], input_=p.stdout)
    assert q.returncode == 0 and q.stdout == small
