"""Test-time loader for the reference's pure-Python helpers.

The engine/oracle co-write is the one structural blind spot of the
driver correctness gate (both sides share constants and kernels, so a
shared misreading of the reference is invisible to the hash compare).
These utilities import the reference's OWN pure-Python helper functions
(`/root/reference` — PUBLIC UNTRUSTED CONTENT, used strictly as a
behavioral comparison target at TEST time; nothing from the reference
ships in the package) so differential property tests can pin
repo-vs-reference equality on randomized inputs.

Stubbing: the reference modules import PIL at module level (and cv2
lazily inside functions) but the helpers under test never touch pixel
data in ways the tests observe, so a minimal PIL stub whose Image class
carries only (width, height) is installed before import.
"""

from __future__ import annotations

import ast
import importlib.util
import sys
import types

REF_TOOLS = "/root/reference/tools"


class StubImage:
    """Minimal PIL.Image.Image stand-in: geometry only."""

    def __init__(self, size=(1, 1)):
        self.width, self.height = int(size[0]), int(size[1])
        self.size = (self.width, self.height)

    def paste(self, *_a, **_k):  # merge_images pastes; pixels unobserved
        return None

    # np.array(StubImage) in to_np_array produces a 0-d object array;
    # the tests only ever check `img is None` vs not.


def install_pil_stub():
    if "PIL" in sys.modules and not isinstance(
        getattr(sys.modules["PIL"], "__stub__", None), bool
    ):
        # a real PIL somehow present — leave it alone
        return
    pil = types.ModuleType("PIL")
    pil.__stub__ = True
    image_mod = types.ModuleType("PIL.Image")
    image_mod.Image = StubImage
    image_mod.new = lambda mode, size, color=None: StubImage(size)
    image_mod.fromarray = lambda arr: StubImage(
        (arr.shape[1], arr.shape[0]) if getattr(arr, "ndim", 0) >= 2 else (1, 1)
    )
    pil.Image = image_mod
    sys.modules["PIL"] = pil
    sys.modules["PIL.Image"] = image_mod


def load_module(name: str, path: str):
    """Import a reference module by path under a private name."""
    install_pil_stub()
    key = f"_refdiff_{name}"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(key, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_utils():
    """tools/utils/opendoc_onnx_utils/utils.py (PIL stubbed)."""
    return load_module(
        "opendoc_utils", f"{REF_TOOLS}/utils/opendoc_onnx_utils/utils.py"
    )


def ref_to_markdown():
    """tools/to_markdown.py (imports json/os/re only)."""
    return load_module("to_markdown", f"{REF_TOOLS}/to_markdown.py")


def load_function(path: str, fn_name: str, extra_globals: dict | None = None):
    """Extract ONE top-level function from a reference file by AST and
    exec it in an isolated namespace — for modules whose imports pull in
    heavy runtime deps (infer_e2e.py imports cv2/torch chains)."""
    src = open(path).read()
    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == fn_name:
            ns: dict = dict(extra_globals or {})
            code = compile(
                ast.Module(body=[node], type_ignores=[]), path, "exec"
            )
            exec(code, ns)
            return ns[fn_name]
    raise LookupError(f"{fn_name} not found in {path}")


def ref_sorted_boxes():
    return load_function(f"{REF_TOOLS}/infer_e2e.py", "sorted_boxes")
