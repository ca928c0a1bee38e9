"""RESULTS generator formatting: the deconv section emits one 9-model
table per test image (phantom + both bundled photographs + terrain),
driven with a stubbed experiment so it runs in milliseconds on CPU."""
import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_make_results():
    spec = importlib.util.spec_from_file_location(
        "make_results", os.path.join(REPO, "scripts", "make_results.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sec_deconv_covers_all_four_images(monkeypatch):
    mr = _load_make_results()

    calls = []

    def fake_prox_lmc_deconv(size, image, make_plots, collect_metrics,
                             wavelet_row, **kw):
        calls.append((image, kw.get("compute_map", False), kw.get("alg")))
        models = [f"M{i} (k5-TV)" for i in range(1, 4)]
        return None, None, {
            "report": {m: {"psnr": 30.0 + i} for i, m in enumerate(models)},
            "psnr_blurred": 25.9,
        }

    monkeypatch.setattr(
        "lmc_atomi_tpu.experiments.deconv.prox_lmc_deconv",
        fake_prox_lmc_deconv,
    )
    lines = []
    mr.sec_deconv(lines)
    text = "\n".join(lines)

    images_called = {c[0] for c in calls}
    assert images_called == {"phantom", "einstein", "hopper", "terrain"}
    # 3 branches (MAP/ULPDA/MYULA) per image
    assert len(calls) == 12
    assert "### Natural image (einstein, 512x512 center crop)" in text
    assert "### Natural image (hopper, 512x512 center crop)" in text
    assert "### Textured synthetic (terrain, 1/f^1.6 spectrum)" in text
    # each image contributes a 3-row table with all three branch columns
    assert text.count("| M1 (k5-TV) | 30.00 | 30.00 | 30.00 |") == 4
    assert text.count("Blurred observation (k5): 25.90 dB.") == 4
