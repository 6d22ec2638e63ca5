"""Unit tests for the bundled-protobuf discovery (protobuf_compat).

The end-to-end proof is the transformWithStateInPandas parity test
(test_state.py) executing in this container; these cover the pure
pieces: runtime validation, overlay construction, and the env-var
override, against synthetic bundle directories.
"""

from __future__ import annotations

import os

from solana_event_stream_spark import protobuf_compat as pc


def _mk_bundle(root, with_builder=True, with_runtime_version=True):
    pb = os.path.join(root, "google", "protobuf")
    os.makedirs(os.path.join(pb, "internal"), exist_ok=True)
    open(os.path.join(pb, "__init__.py"), "w").write("__version__='9.9'\n")
    if with_builder:
        open(os.path.join(pb, "internal", "builder.py"), "w").write("")
    if with_runtime_version:
        open(os.path.join(pb, "runtime_version.py"), "w").write("")
    return pb


def test_runtime_ok_requires_builder_and_runtime_version(tmp_path):
    good = _mk_bundle(str(tmp_path / "good"))
    no_builder = _mk_bundle(str(tmp_path / "nb"), with_builder=False)
    no_rv = _mk_bundle(str(tmp_path / "nrv"), with_runtime_version=False)
    assert pc._runtime_ok(good)
    assert not pc._runtime_ok(no_builder)      # pre-3.20 gencode runtime
    assert not pc._runtime_ok(no_rv)           # pre-5.27: StateMessage_pb2
    assert not pc._runtime_ok(str(tmp_path / "missing"))


def test_env_override_wins_candidate_discovery(tmp_path, monkeypatch):
    pb = _mk_bundle(str(tmp_path / "bundle"))
    monkeypatch.setenv("SES_SPARK_PROTOBUF_DIR", pb)
    assert pc.find_bundled_protobuf() == pb
    monkeypatch.setenv("SES_SPARK_PROTOBUF_DIR",
                       str(tmp_path / "nonexistent"))
    # invalid override falls through to the built-in candidate list
    found = pc.find_bundled_protobuf()
    assert found != str(tmp_path / "nonexistent")


def test_build_overlay_exposes_only_protobuf(tmp_path):
    pb = _mk_bundle(str(tmp_path / "bundle"))
    # sibling SDK packages that must NOT leak through the overlay
    os.makedirs(str(tmp_path / "bundle" / "google" / "appengine"))
    overlay = str(tmp_path / "overlay")
    out = pc._build_overlay(pb, overlay)
    assert out == overlay
    gdir = os.path.join(overlay, "google")
    assert os.path.isfile(os.path.join(gdir, "__init__.py"))
    assert "pkgutil" in open(os.path.join(gdir, "__init__.py")).read()
    link = os.path.join(gdir, "protobuf")
    assert os.path.realpath(link) == os.path.realpath(pb)
    assert sorted(os.listdir(gdir)) == ["__init__.py", "protobuf"]
    # idempotent, and re-targets if the bundle moved
    pb2 = _mk_bundle(str(tmp_path / "bundle2"))
    pc._build_overlay(pb2, overlay)
    assert os.path.realpath(link) == os.path.realpath(pb2)


def test_ensure_protobuf_reports_importability():
    # In this container conftest already activated a runtime (or a real
    # install exists); ensure_protobuf must agree with importability
    # and keep being idempotent.
    assert pc.ensure_protobuf() == pc.have_native_protobuf()
    assert pc.ensure_protobuf() == pc.have_native_protobuf()
