"""Executes Splice_tpu.ipynb end to end with a tiny config (closing
SURVEY C15: the reference's only de-facto e2e validation is its Colab
notebook, reference Splice.ipynb cells 2-8 — ours must actually run, not
just exist). The notebook's OVERRIDES hook parameterizes the run; a
prepended setup cell forces the kernel onto CPU with the shared compile
cache."""
import pathlib
import shutil

import nbformat
import pytest
from nbclient import NotebookClient

NB_PATH = pathlib.Path(__file__).resolve().parent.parent / "Splice_tpu.ipynb"


@pytest.mark.slow
def test_notebook_executes_end_to_end(tmp_path):
    src = pathlib.Path("datasets/splicing/cows")
    root = tmp_path / "pair"
    shutil.copytree(src / "A", root / "A")
    shutil.copytree(src / "B", root / "B")

    nb = nbformat.read(str(NB_PATH), as_version=4)
    # Parameterize via the notebook's own hooks; assert they exist so
    # notebook drift breaks this test loudly instead of silently running
    # the full-size config.
    assert "OVERRIDES" in nb.cells[5].source
    nb.cells[5].source = (
        "VIT_WEIGHTS = None\n"
        "N_STEPS = 4\n"
        "OVERRIDES = dict(A_resize=48, B_resize=48, seed=3,\n"
        "                 log_images_freq=2, entire_A_every=10,\n"
        "                 dino_model_name='dino_vits8',\n"
        "                 dino_global_patch_size=32,\n"
        "                 dino_global_max_size=64,\n"
        "                 use_pallas_attention=False, remat_vit=False,\n"
        "                 vit_compute_dtype='float32')\n")
    assert "datasets/splicing/cows" in nb.cells[3].source
    nb.cells[3].source = nb.cells[3].source.replace(
        "'datasets/splicing/cows'", repr(str(root)))
    setup = nbformat.v4.new_code_cell(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " '/tmp/jax_test_cache')\n"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes',"
        " -1)\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs',"
        " 0.0)\n")
    # nbclient requires ids on all cells in v4.5+ notebooks
    nb.cells.insert(0, setup)
    for i, c in enumerate(nb.cells):
        c.id = f"cell-{i}"

    client = NotebookClient(nb, timeout=600, kernel_name="python3",
                            resources={"metadata": {"path": str(
                                NB_PATH.parent)}})
    client.execute()

    assert (root / "out" / "output.png").exists()
    assert (root / "out" / "structure_pca.png").exists()
