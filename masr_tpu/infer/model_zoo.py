"""Pretrained-model registry + cache (parity surface: predict.py:42-58 —
`model_tag` auto-download and unzip into the user cache).

The registry maps tag → bundle URL. Published masr_tpu bundles can be
registered here or at runtime via `register_model`; reference-MASR
checkpoints are converted with tools/convert_masr_checkpoint.py.
"""
import os
import urllib.request
import zipfile

from masr_tpu.utils.logger import setup_logger

logger = setup_logger()

CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "masr_tpu",
                         "models")

# tag → bundle zip URL (populate as bundles are published)
MODEL_URLS = {}


def register_model(tag, url):
    MODEL_URLS[tag] = url


def get_model_dir(model_tag):
    """Resolve a model tag to a local bundle directory, downloading and
    unpacking into the cache on first use."""
    target = os.path.join(CACHE_DIR, model_tag)
    bundle = os.path.join(target, "inference_model")
    if os.path.exists(os.path.join(bundle, "inference.json")):
        return bundle
    if os.path.exists(os.path.join(target, "inference.json")):
        return target
    url = MODEL_URLS.get(model_tag)
    if url is None:
        raise ValueError(
            f"unknown model_tag '{model_tag}' and no cached copy in "
            f"{target}; known tags: {sorted(MODEL_URLS) or '(none)'} — "
            f"register one with masr_tpu.infer.model_zoo.register_model or "
            f"convert a reference checkpoint with "
            f"tools/convert_masr_checkpoint.py")
    os.makedirs(target, exist_ok=True)
    zip_path = os.path.join(target, "bundle.zip")
    logger.info(f"downloading {url} → {zip_path}")
    with urllib.request.urlopen(url) as src, open(zip_path, "wb") as out:
        while True:
            buf = src.read(1 << 15)
            if not buf:
                break
            out.write(buf)
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(target)
    os.remove(zip_path)
    if os.path.exists(os.path.join(bundle, "inference.json")):
        return bundle
    if os.path.exists(os.path.join(target, "inference.json")):
        return target
    raise RuntimeError(f"downloaded bundle for {model_tag} is malformed")
