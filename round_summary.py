"""Render the round's benchmark/evidence artifacts as one table
(STATUS.md's data source; run any time)."""
import json
import os


def main():
    here = os.path.dirname(os.path.abspath(__file__))

    def load(name):
        p = os.path.join(here, name)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    ba = load("BENCH_ALL_r05.json")
    if ba:
        print("config                           best_ms  vs_floor  median"
              "   n  spread")
        for c in ba["configs"]:
            print(f"{c['metric']:32s} {c['measured_ms']:7.4f}  "
                  f"{c['vs_baseline']:7.4f}  {c.get('median_ms', 0):7.4f} "
                  f"{c.get('n_captures', 0):3d}  "
                  f"{c.get('spread', 0):5.2f}"
                  + ("  UNHEALTHY" if c.get("unhealthy") else ""))
    au = load("AUDIO_r05.json")
    if au:
        print(f"\naudio 160/147 1M: {au['measured_ms']} ms "
              f"({au['msamples_per_s_in']} Ms/s in), "
              f"vs r4 floor {au['vs_r4_floor']}, "
              f"{au['speedup_vs_r4']}x over r4")
    mh = load("MULTIHOST_r05.json")
    if mh:
        for r in mh.get("runs", []):
            print(f"multihost {r['n_processes']}x"
                  f"{r['local_devices_per_process']}: ok={r['ok']} "
                  f"({len(r['checks'])} checks)")
    sc = load("SCALING_r05.json")
    if sc:
        for name, e in sc["workloads"].items():
            eff = e.get("strong_efficiency", {})
            proj = e.get("ici_projection", [])
            print(f"scaling {name:22s} pinned-eff {eff}  "
                  f"ici-proj {[p['projected_efficiency'] for p in proj]}")


if __name__ == "__main__":
    main()
