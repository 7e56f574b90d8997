#!/usr/bin/env python3
"""Extract numeric parameters from the reference's sklearn joblib artifacts
into plain JSON resources (src/main/resources/graft/ml/), so the Scala
scorer reproduces the exact pipeline with zero sklearn dependency.

The .joblib files are uncompressed joblib pickle streams; numpy arrays are
stored as NumpyArrayWrapper objects followed by raw bytes (optionally with
alignment padding). sklearn classes are stubbed — we only need attributes.
"""
import io, json, pickle, struct, sys
import numpy as np

class SklearnStub:
    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {"state": state})

class NumpyArrayWrapper:
    def read_array(self, unpickler):
        dtype = np.dtype(self.dtype) if not isinstance(self.dtype, np.dtype) else self.dtype
        if dtype.hasobject:
            return pickle.load(unpickler.file_handle)
        if getattr(self, "numpy_array_alignment_bytes", None):
            pad = int.from_bytes(unpickler.file_handle.read(1), "little")
            if pad:
                unpickler.file_handle.read(pad)
        count = int(np.prod(self.shape)) if self.shape else 1
        data = unpickler.file_handle.read(count * dtype.itemsize)
        arr = np.frombuffer(data, dtype=dtype, count=count)
        return arr.reshape(self.shape, order=getattr(self, "order", "C"))

class StubUnpickler(pickle._Unpickler):
    def __init__(self, fh):
        super().__init__(fh)
        self.file_handle = fh

    def find_class(self, module, name):
        if module.startswith("numpy") or module == "copyreg":
            return super().find_class(module, name)
        if name == "NumpyArrayWrapper":
            return NumpyArrayWrapper
        t = type(name, (SklearnStub,), {})
        return t

    dispatch = pickle._Unpickler.dispatch.copy()

    def load_build(self):
        pickle._Unpickler.load_build(self)
        if isinstance(self.stack[-1], NumpyArrayWrapper):
            self.stack[-1] = self.stack[-1].read_array(self)

    dispatch[pickle.BUILD[0]] = load_build

def load(path):
    with open(path, "rb") as f:
        return StubUnpickler(f).load()

def arr(x):
    return np.asarray(x).tolist()

def main(ref, outdir):
    imp = load(f"{ref}/imputer.joblib").__dict__
    scaler = load(f"{ref}/scaler.joblib").__dict__
    pca = load(f"{ref}/pca_14components.joblib").__dict__
    km = load(f"{ref}/kmeans_k4.joblib").__dict__

    features = [str(s) for s in np.asarray(imp["feature_names_in_"]).ravel()]
    out = {
        "features": features,                      # 19 input columns, order fixed
        "imputer_medians": arr(imp["statistics_"]),
        "scaler_mean": arr(scaler["mean_"]),
        "scaler_scale": arr(scaler["scale_"]),
        "pca_mean": arr(pca["mean_"]),
        "pca_components": arr(pca["components_"]),  # (14, 19)
        "kmeans_centers": arr(km["cluster_centers_"]),  # (4, 14)
    }
    with open(f"{outdir}/pipeline_params.json", "w") as f:
        json.dump(out, f, indent=1)
    print("features:", features)
    print("shapes:", {k: np.asarray(v).shape for k, v in out.items() if k != "features"})

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference",
         sys.argv[2] if len(sys.argv) > 2 else "src/main/resources/graft/ml")
