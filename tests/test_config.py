"""Config system: group files, per-entry-point group trees, hydra-style
`+` append syntax, and dotted overrides."""

from manipose_tpu.config import load_config


class TestGroups:
    def test_h36m_group_override(self):
        cfg = load_config("config", overrides=["train=debug"])
        assert cfg.train.epochs == 1

    def test_toy_group_resolves_from_toy_tree(self):
        """configs/toy/train/mlp_hard2.yaml shadows configs/train/
        (reference keeps separate conf trees per entry point)."""
        cfg = load_config("toy", overrides=["train=mlp_hard2"])
        assert cfg.train.epochs == 50
        assert cfg.train.lr == 1e-2

    def test_toy_3d_setup_groups(self):
        cfg = load_config(
            "toy", overrides=["data=3D_setup", "train=3D_setup"]
        )
        assert cfg.data.scenario == "torus-2Dto3D"
        assert cfg.data.n_train == 20000
        assert cfg.data.major_radius == 2
        assert cfg.train.batch_size == 1000

    def test_hydra_plus_prefix_accepted(self):
        """The reference sweep scripts write +train=... / +data=...."""
        cfg = load_config(
            "toy", overrides=["+data=3D_setup", "+train=3D_setup"]
        )
        assert cfg.data.scenario == "torus-2Dto3D"
        assert cfg.train.epochs == 50

    def test_fast_preset_is_one_switch(self):
        """model=fast bundles the measured documented-divergence speed
        wins (currently nheads_seg=2, +2.0% on-chip, trained-outcome
        neutral — BASELINE.md "Fast segments branch") without touching
        anything else; a later explicit override still wins."""
        base = load_config("config")
        cfg = load_config("config", overrides=["model=fast"])
        assert cfg.model.nheads_seg == 2
        # nothing else in the model section diverges from the default
        for key, val in base.model.items():
            if key != "nheads_seg":
                assert cfg.model[key] == val, key
        # explicit override after the preset wins (hydra ordering)
        cfg = load_config(
            "config", overrides=["model=fast", "model.nheads_seg=8"]
        )
        assert cfg.model.nheads_seg == 8

    def test_dotted_override_after_group(self):
        cfg = load_config(
            "toy", overrides=["train=mlp_hard2", "train.epochs=7"]
        )
        assert cfg.train.epochs == 7

    def test_value_parsing(self):
        cfg = load_config(
            "config",
            overrides=["train.lr=1e-3", "run.train=false",
                       "data.actions=walking,eating"],
        )
        assert cfg.train.lr == 1e-3
        assert cfg.run.train is False
        assert cfg.data.actions == "walking,eating"
