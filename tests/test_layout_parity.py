"""Cross-layout parity: the packed dataset + on-device pipeline must produce the
SAME training batches as the legacy file-per-patch tree written by the preprocess
CLI (which itself materializes augmentation + labels with the same ops). This
pins the equivalence the packed fast path relies on (SURVEY.md §7 step 4)."""

import numpy as np
import pytest

from util_synth import synth_scene
from resuneta_tpu.data.isprs import LABEL_DICT, class_ids_to_rgb


@pytest.fixture(scope="module")
def both_layouts(tmp_path_factory):
    from resuneta_tpu.cli.preprocess_isprs import main

    root = tmp_path_factory.mktemp("scene")
    image, ids = synth_scene(96, 96, seed=3)
    np.save(root / "Image_Train.npy", image.transpose(2, 0, 1))
    np.save(root / "Reference_Train.npy",
            class_ids_to_rgb(ids, LABEL_DICT).transpose(2, 0, 1))

    packed = tmp_path_factory.mktemp("packed")
    legacy = tmp_path_factory.mktemp("legacy")
    common = ["--patch_size", "64", "--stride", "32", "--num_classes", "5",
              "--dataset_path", str(root)]
    main(common + ["--output_path", str(packed)])
    main(common + ["--output_path", str(legacy), "--layout", "legacy"])
    return packed, legacy


class TestLayoutParity:
    def test_batches_match(self, both_layouts):
        from resuneta_tpu.data import (
            PackedDataset, LegacyPatchDataset, make_device_pipeline,
        )

        packed_dir, legacy_dir = both_layouts
        packed = PackedDataset(str(packed_dir))
        legacy = LegacyPatchDataset(str(legacy_dir), multitasking=True)
        assert len(packed) == len(legacy)

        # legacy files are patch_{k}.npy; listdir order is lexicographic, so map
        # logical sample k -> its position in the sorted name list
        import os
        names = sorted(os.listdir(os.path.join(str(legacy_dir), "train")))
        name_pos = {n: i for i, n in enumerate(names)}

        pipe = make_device_pipeline(5, norm_type=1, multitasking=True)
        sel = np.array([0, 3, 7, 11, 4])  # mixes augmentation variants
        raw = packed.get_batch(sel)
        dev = {k: np.asarray(v) for k, v in pipe(raw).items()}

        legacy_pos = [name_pos[f"patch_{k}.npy"] for k in sel]
        disk = legacy.get_batch(legacy_pos)

        np.testing.assert_allclose(dev["image"], disk["image"], atol=1e-6)
        np.testing.assert_array_equal(dev["seg"], disk["seg"])
        np.testing.assert_array_equal(dev["bound"], disk["bound"])
        np.testing.assert_allclose(dev["dist"], disk["dist"], atol=1e-6)
        np.testing.assert_allclose(dev["color"], disk["color"], atol=1e-6)
