"""CLI smoke tests: every subcommand end-to-end at small sizes (the CLI
is the L5 harness, cf. main() qpsk.c:289-359 — these pin the argument
wiring, not DSP quality, which the library tests own)."""

import json

import numpy as np

from qpsk_tpu import cli


def _run(capsys, argv):
    rc = cli.main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0, (argv, rc)
    return [json.loads(line) for line in out]


def test_loopback_and_payload_bytes(capsys):
    (rec,) = _run(capsys, ["loopback", "--frames", "20", "--snr-db", "14"])
    assert rec["per"] == 0.0 and rec["sync_score"] >= 3
    assert abs(rec["detected_offset_hz"] - 50.0) < 3.0
    # multi-frame packets via --payload-bytes (spans 2+ frames)
    (rec,) = _run(capsys, ["loopback", "--frames", "20", "--snr-db", "14",
                           "--payload-bytes", "64"])
    assert rec["per"] == 0.0


def test_tx_rx_roundtrip_file(tmp_path, capsys):
    spool = str(tmp_path / "s.raw")
    _run(capsys, ["tx", "--frames", "20", "--out", spool])
    (rec,) = _run(capsys, ["rx", spool])
    assert rec["per"] == 0.0 and rec["sync_score"] >= 3


def test_fdm_subcommand(capsys):
    (rec,) = _run(capsys, ["fdm", "--frames", "16", "--snr-db", "18"])
    assert rec["nchan"] == 3
    for ch in rec["channels"]:
        assert ch["per"] == 0.0 and ch["sync_score"] >= 3


def test_sweep_emits_points(capsys):
    recs = _run(capsys, ["sweep", "--snr-db", "12,14", "--frames", "24"])
    assert [r["snr_db"] for r in recs] == [12.0, 14.0]
    assert recs[1]["per"] == 0.0


def test_bench_suite_record(capsys):
    (rec,) = _run(capsys, ["bench", "--suite", "serial"])
    assert rec["metric"] == "single_stream_serial_throughput"
    assert rec["value"] > 0
