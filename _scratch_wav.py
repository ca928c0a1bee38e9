import sys
from lmc_atomi_tpu.experiments.inpainting import wavelet_inpainting
for image in ("phantom", "einstein"):
    for wav in ("haar", "d4", "d8"):
        _, s = wavelet_inpainting(size=512, wavelet=wav, image=image, n_steps=2000,
                               make_plots=False)
        print(f"{image} {wav}: "
              + " ".join(f"{k}={v['psnr']:.2f}" for k, v in s["report"].items()),
              file=sys.stderr)
