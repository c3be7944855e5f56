#!/usr/bin/env python3
"""Export our circuit netlists as ngspice .cir decks (the SPICE oracle).

The reference keeps its circuits as SPICE netlists and validates the Rust
solvers against ngspice testbenches. Here the netlists live as Python
builders (circuits/*.py); this tool exports them back to ngspice format so
the same external-oracle workflow works wherever ngspice is available:

    python tools/export_spice.py --out spice/
    ngspice -b spice/tb_preamp_dc.cir   # compare .op against our dc_solve
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _fmt(v):
    return f"{v:.6g}"


def netlist_to_cir(nl, title, tb_lines=()):
    names = {v: k for k, v in nl._nodes.items()}

    def node(n):
        return "0" if n < 0 else names[n]

    lines = [f"* {title}", "* exported from openwurli_tpu circuit builders"]
    models = {}
    for i, (n1, n2, r) in enumerate(nl.resistors):
        lines.append(f"R{i+1} {node(n1)} {node(n2)} {_fmt(r)}")
    for i, (n1, n2, c) in enumerate(nl.capacitors):
        lines.append(f"C{i+1} {node(n1)} {node(n2)} {_fmt(c)}")
    for name, np_, nm_, v in nl.vsources:
        lines.append(f"V{name[1:] if name.startswith('V') else name} "
                     f"{node(np_)} {node(nm_)} DC {_fmt(v)}")
    for name, nc, nb, ne, model, sign in nl.bjts:
        mtype = "PNP" if sign < 0 else "NPN"
        mname = f"Q{mtype}{abs(hash((model.is_, model.bf))) % 10000}"
        if mname not in models:
            parts = [f"IS={_fmt(model.is_)}", f"BF={_fmt(model.bf)}",
                     f"NF={_fmt(model.nf)}", f"BR={_fmt(model.br)}",
                     f"NR={_fmt(model.nr)}"]
            import math

            if math.isfinite(model.vaf):
                parts.append(f"VAF={_fmt(model.vaf)}")
            if math.isfinite(model.var):
                parts.append(f"VAR={_fmt(model.var)}")
            if math.isfinite(model.ikf):
                parts.append(f"IKF={_fmt(model.ikf)}")
            if math.isfinite(model.ikr):
                parts.append(f"IKR={_fmt(model.ikr)}")
            if model.ise:
                parts += [f"ISE={_fmt(model.ise)}", f"NE={_fmt(model.ne)}"]
            if model.isc:
                parts += [f"ISC={_fmt(model.isc)}", f"NC={_fmt(model.nc)}"]
            if model.cje:
                parts.append(f"CJE={_fmt(model.cje)}")
            if model.cjc:
                parts.append(f"CJC={_fmt(model.cjc)}")
            models[mname] = f".model {mname} {mtype}({' '.join(parts)})"
        lines.append(f"{name} {node(nc)} {node(nb)} {node(ne)} {mname}")
    for name, np_, nm_, model in nl.diodes:
        mname = f"D{abs(hash((model.is_, model.n))) % 10000}"
        if mname not in models:
            models[mname] = (f".model {mname} D(IS={_fmt(model.is_)} "
                             f"N={_fmt(model.n)})")
        lines.append(f"{name} {node(np_)} {node(nm_)} {mname}")
    lines.extend(models.values())
    lines.extend(tb_lines)
    lines.append(".end")
    return "\n".join(lines) + "\n"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="spice")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from openwurli_tpu.circuits import melange_preamp, power_amp, tremolo

    decks = {
        "wurli-preamp.cir": (melange_preamp.build_netlist(),
                             "Wurlitzer 200A Reed-Bar Preamp",
                             [".op", ".print op all"]),
        "wurli-tremolo.cir": (tremolo.build_netlist(),
                              "Wurlitzer 200A Tremolo Oscillator (Twin-T)",
                              [".tran 0.1m 4 0 0.1m", ".print tran v(out)"]),
        "wurli-power-amp.cir": (power_amp.build_netlist(),
                                "Wurlitzer 200A Power Amplifier (Class AB)",
                                [".op"]),
    }
    for fname, (nl, title, tb) in decks.items():
        path = os.path.join(args.out, fname)
        with open(path, "w") as f:
            f.write(netlist_to_cir(nl, title, tb))
        print(f"wrote {path}")

    # DC-bias testbench with our solver's values as expected comments.
    from openwurli_tpu.circuits import mna

    nl = tremolo.build_netlist()
    v_dc, _, _ = mna.dc_solve(nl)
    names = list(nl._nodes)
    tb = [f"* expected (openwurli_tpu dc_solve): "
          f"{', '.join(f'{n}={v_dc[i]:.4f}' for i, n in enumerate(names))}",
          ".op"]
    with open(os.path.join(args.out, "tb_tremolo_dc.cir"), "w") as f:
        f.write(netlist_to_cir(nl, "Tremolo DC bias verification", tb))
    print(f"wrote {os.path.join(args.out, 'tb_tremolo_dc.cir')}")


if __name__ == "__main__":
    main()
