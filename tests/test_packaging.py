"""Packaging metadata stays in sync with the source tree.

The real install path (pip wheel build + native extension compile) was
validated manually and is too heavy for the suite; these tests pin the
drift-prone parts: the explicit package list in pyproject.toml, the shipped
config data, and the native-lib search order.
"""

import os
import tomllib

import vibevoice_tpu
from vibevoice_tpu.utils import native_dsp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_package_list_matches_source_tree():
    declared = set(_pyproject()["tool"]["setuptools"]["packages"])
    pkg_root = os.path.join(REPO, "vibevoice_tpu")
    actual = {"vibevoice_tpu"}
    for name in os.listdir(pkg_root):
        if os.path.isfile(os.path.join(pkg_root, name, "__init__.py")):
            actual.add(f"vibevoice_tpu.{name}")
    assert declared == actual, (
        f"pyproject packages drifted: missing={actual - declared}, "
        f"stale={declared - actual}"
    )


def test_config_jsons_are_package_data():
    data = _pyproject()["tool"]["setuptools"]["package-data"]["vibevoice_tpu"]
    assert "configs/*.json" in data
    cfg_dir = os.path.join(REPO, "vibevoice_tpu", "configs")
    assert {f for f in os.listdir(cfg_dir) if f.endswith(".json")} == {
        "qwen2.5_0.5b_streaming.json",
        "qwen2.5_1.5b_64k.json",
        "qwen2.5_7b_32k.json",
    }


def test_native_lib_env_override(tmp_path, monkeypatch):
    # a set-but-missing override must not fall through to another location
    monkeypatch.setenv("VIBEVOICE_TPU_NATIVE_LIB", str(tmp_path / "nope.so"))
    assert native_dsp._find_lib() is None
    lib = tmp_path / "libaudio_dsp.so"
    lib.write_bytes(b"")
    monkeypatch.setenv("VIBEVOICE_TPU_NATIVE_LIB", str(lib))
    assert native_dsp._find_lib() == str(lib)


def test_version_attr_matches_pyproject():
    assert vibevoice_tpu.__version__ == _pyproject()["project"]["version"]
