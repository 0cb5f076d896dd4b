import time, glob, gzip, json, os, collections
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from splice_tpu import trainer
from splice_tpu.config import load_config
from splice_tpu.data import load_pair

cfg = load_config(None, dict(dataroot="datasets/splicing/cows", seed=3))
pair = load_pair(cfg)
extractor = trainer.make_extractor_from_config(cfg)
program = trainer.build_program(cfg, pair, extractor)
state = program.init_state(jax.random.PRNGKey(0))
key = jax.random.PRNGKey(7)
lam = jnp.asarray(trainer.lambdas_vec(cfg, 5))
state, parts = program.step_chunk(state, pair.A, pair.B, jnp.int32(1), key, lam, 10)
_ = float(parts["loss"])
print("warm", flush=True)
td = "/tmp/splice_trace2"
os.system(f"rm -rf {td}")
jax.profiler.start_trace(td)
state, parts = program.step_chunk(state, pair.A, pair.B, jnp.int32(11), key, lam, 10)
_ = float(parts["loss"])
jax.profiler.stop_trace()

f = glob.glob(f"{td}/**/*.trace.json.gz", recursive=True)[0]
with gzip.open(f) as fh:
    data = json.load(fh)
events = [e for e in data["traceEvents"]
          if e.get("ph") == "X" and e.get("pid") == 3]
agg = collections.Counter(); cnt = collections.Counter()
tot = 0
for e in events:
    n = e["name"]
    if n == "1" or n.startswith("jit_"):
        continue
    if n.startswith("while."):
        agg[("WHILE", n)] += e["dur"]
        continue
    cat = e.get("args", {}).get("hlo_category", "?")
    agg[(cat, "")] += e["dur"]; cnt[(cat, "")] += 1
for (cat, n), dur in agg.most_common(18):
    print(f"{dur/1e4:9.2f} ms/step  x{cnt[(cat,n)]:5d}  {cat} {n}")
# top individual non-while ops
singles = collections.Counter(); scnt = collections.Counter()
for e in events:
    n = e["name"]
    if n == "1" or n.startswith("jit_") or n.startswith("while."):
        continue
    singles[n] += e["dur"]; scnt[n] += 1
print("\ntop ops:")
name2ln = {}
for e in events:
    if e["name"] not in name2ln and "long_name" in e.get("args", {}):
        name2ln[e["name"]] = e["args"]["long_name"][:110]
for n, dur in singles.most_common(18):
    print(f"{dur/1e4:8.2f} ms/step x{scnt[n]//10:4d} {n[:30]:32s} {name2ln.get(n,'')[:100]}")
print("ALL DONE", flush=True)
