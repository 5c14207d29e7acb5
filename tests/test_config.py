import os
import textwrap

from libcontinual_tpu.config import Config


def test_default_chain_loads():
    cfg = Config().get_config_dict()
    assert cfg["seed"] == 1993
    assert cfg["buffer"]["name"] == "LinearBuffer"
    assert cfg["optimizer"]["kwargs"]["lr"] == 0.1


def test_includes_and_merge_priority(tmp_path):
    (tmp_path / "header.yaml").write_text("epoch: 99\nfoo: 1\n")
    (tmp_path / "main.yaml").write_text(
        textwrap.dedent(
            """
            includes:
              - header.yaml
            foo: 2
            lr2: 1e-3
            """
        )
    )
    cfg = Config(str(tmp_path / "main.yaml")).get_config_dict()
    assert cfg["epoch"] == 99  # from include
    assert cfg["foo"] == 2  # including file beats include
    assert isinstance(cfg["lr2"], float) and cfg["lr2"] == 1e-3  # float resolver


def test_overrides_win(tmp_path):
    (tmp_path / "m.yaml").write_text("epoch: 5\n")
    cfg = Config(str(tmp_path / "m.yaml"), overrides={"epoch": 7}).get_config_dict()
    assert cfg["epoch"] == 7


def test_shallow_top_level_merge(tmp_path):
    # reference semantics: top-level replacement, not deep merge
    (tmp_path / "m.yaml").write_text("optimizer:\n  name: Adam\n  kwargs:\n    lr: 0.01\n")
    cfg = Config(str(tmp_path / "m.yaml")).get_config_dict()
    assert cfg["optimizer"] == {"name": "Adam", "kwargs": {"lr": 0.01}}
