"""Environment report (reference radet/utils/collect_env.py parity)."""

from __future__ import annotations

import platform
import sys
from typing import Dict


def collect_env() -> Dict[str, str]:
    import jax

    info: Dict[str, str] = {
        "python": sys.version.replace("\n", " "),
        "platform": platform.platform(),
        "jax": jax.__version__,
    }
    try:
        import jaxlib

        info["jaxlib"] = jaxlib.__version__
    except ImportError:
        pass
    for mod in ("flax", "optax", "numpy", "cv2"):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, "__version__", "?")
        except ImportError:
            info[mod] = "absent"
    try:
        devs = jax.devices()
        info["devices"] = ", ".join(str(d) for d in devs)
        info["device_count"] = str(len(devs))
        info["process_count"] = str(jax.process_count())
    except RuntimeError as e:
        info["devices"] = f"unavailable ({e})"
    from ..ops import native

    info["native_ops"] = "built" if native.load() is not None else "unavailable"
    return info


def env_report() -> str:
    return "\n".join(f"{k}: {v}" for k, v in collect_env().items())


if __name__ == "__main__":
    print(env_report())
