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

    # ── testbench decks with expected values from our own solvers ──
    # (the reference ships 30 tb_*.cir oracle decks, spice/testbench/;
    # these regenerable decks cover the same roles: DC bias, AC gain,
    # THD, LDR sweeps, tremolo oscillation, pump family, full chain.)
    import numpy as np

    from openwurli_tpu.circuits import dk_preamp, gp, mna

    def write(fname, text):
        path = os.path.join(args.out, fname)
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")

    def dc_expect(nl, extra_r=None):
        nl2 = nl
        v_dc, _, _ = mna.dc_solve(nl2)
        names = list(nl2._nodes)
        return v_dc, names

    def ac_gain(nl, v_nl_dc, freqs, out_node, extra_g=None):
        """Small-signal |H| from the GP linearisation at the DC OP."""
        asm = nl.assemble()
        jdev = np.asarray(gp.analytic_device_jacobian_fn(nl)(v_nl_dc))
        g_lin = asm["g"] + asm["n_i"] @ jdev @ asm["n_v"]
        if extra_g:
            for node_idx, gval in extra_g:
                g_lin[node_idx, node_idx] += gval
        out = nl._nodes[out_node]
        gains = []
        for f in freqs:
            a = g_lin + 2j * np.pi * f * asm["c"]
            rhs = np.zeros(asm["n"], dtype=complex)
            rhs[asm["input_row"]] = 1.0
            x = np.linalg.solve(a, rhs)
            gains.append(abs(x[out]))
        return gains

    # 1. tremolo DC bias
    nl = tremolo.build_netlist()
    v_dc, names = dc_expect(nl)
    write("tb_tremolo_dc.cir", netlist_to_cir(
        nl, "Tremolo DC bias verification",
        [f"* expected (openwurli_tpu dc_solve): "
         f"{', '.join(f'{n}={v_dc[i]:.4f}' for i, n in enumerate(names))}",
         ".op"]))

    # 2. tremolo oscillator startup (rate + swing expectations)
    write("tb_tremolo_osc.cir", netlist_to_cir(
        nl, "Twin-T tremolo oscillator startup",
        ["* expected: oscillation builds from the unstable DC point;",
         "* rate 5.3-5.6 Hz, steady swing ~0.7-11.0 V at out",
         "* (reference gate band 4.5-7.5 Hz, dk_preamp/mod.rs:243-327)",
         ".ic v(out)=11.2", ".tran 0.2m 4 0 0.2m",
         ".print tran v(out)"]))

    # 3. preamp DC bias (LDR branch at its 1 MOhm quiescent)
    nlp = melange_preamp.build_netlist()
    nlp_dc = melange_preamp.build_netlist()
    nlp_dc.r("fb", "0", melange_preamp.R_LDR_INIT)
    v_dc, names = dc_expect(nlp_dc)
    write("tb_preamp_dc.cir", netlist_to_cir(
        nlp_dc, "Preamp DC bias verification (R_ldr = 1 MEG)",
        [f"* expected (openwurli_tpu dc_solve): "
         f"{', '.join(f'{n}={v_dc[i]:.4f}' for i, n in enumerate(names))}",
         ".op"]))

    # 4. preamp DC bias vs R_ldr
    lines = []
    for r in (19e3, 100e3, 1e6):
        nl_r = melange_preamp.build_netlist()
        nl_r.r("fb", "0", r)
        v_dc, names = dc_expect(nl_r)
        lines.append(f"* R_ldr={r:.0f}: "
                     + ", ".join(f"{n}={v_dc[i]:.4f}"
                                 for i, n in enumerate(names)
                                 if n in ("base1", "coll1", "coll2",
                                          "out", "fb")))
    nl_r = melange_preamp.build_netlist()
    nl_r.r("fb", "0", 100e3)
    write("tb_preamp_dc_vs_rldr.cir", netlist_to_cir(
        nl_r, "Preamp DC bias vs LDR resistance (deck at 100k; edit R_ldr)",
        lines + [".op"]))

    # 5. preamp AC gain (small-signal linearisation expectations)
    solver_pp = melange_preamp.make_params(88200.0)
    v_nl_dc = np.asarray(solver_pp.solver.v_nl_dc)
    fb_idx = nlp._nodes["fb"]
    freqs = [100.0, 1000.0, 5000.0, 15000.0]
    gains = ac_gain(nlp, v_nl_dc, freqs, "out",
                    extra_g=[(fb_idx, 1.0 / 1e6)])
    nlp_ac = melange_preamp.build_netlist()
    nlp_ac.r("fb", "0", 1e6)
    write("tb_preamp_ac.cir", netlist_to_cir(
        nlp_ac, "Preamp AC response (R_ldr = 1 MEG)",
        ["* expected |H| (openwurli_tpu GP linearisation at DC OP):"]
        + [f"*   {f:.0f} Hz: {g:.3f}x ({20*np.log10(g):.2f} dB)"
           for f, g in zip(freqs, gains)]
        + ["* reference: ~15 dB closed-loop midband (tb_preamp_ac.cir),"
           "* bandwidth ~15.5 kHz approx. independent of R_ldr",
           "VIN in 0 AC 1", ".ac dec 20 10 100k",
           ".print ac vdb(out)"]))

    # 6. preamp AC gain across the LDR sweep
    lines = ["* expected midband (1 kHz) gain vs R_ldr:"]
    for r in (9e3, 19e3, 56e3, 150e3, 1e6):
        g1k = ac_gain(nlp, v_nl_dc, [1000.0], "out",
                      extra_g=[(fb_idx, 1.0 / r)])[0]
        lines.append(f"*   R_ldr={r:9.0f}: {20*np.log10(g1k):6.2f} dB")
    write("tb_preamp_ac_sweep_ldr.cir", netlist_to_cir(
        nlp_ac, "Preamp gain vs LDR (deck at 1 MEG; edit R_ldr)",
        lines + ["VIN in 0 AC 1", ".ac lin 1 1000 1000",
                 ".print ac vdb(out)"]))

    # 7. preamp THD (transient oracle)
    write("tb_real_thd.cir", netlist_to_cir(
        nlp_ac, "Preamp THD at 1 kHz, 1 mV drive",
        ["* expected (openwurli_tpu circuits/dk_preamp +"
         " melange variant agree to 0.45 dB):",
         "* THD(H2-H5) ~ small-signal 0.001-0.01 % at 1 mV;"
         " H2 dominates (single-ended stages)",
         "VIN in 0 SIN(0 1m 1k)", ".tran 5u 50m 30m 5u",
         ".fourier 1k v(out)"]))

    # 8. power amp DC bias
    nlpa = power_amp.build_netlist()
    v_dc, names = dc_expect(nlpa)
    write("tb_power_amp.cir", netlist_to_cir(
        nlpa, "Class AB power amp DC bias",
        [f"* expected (openwurli_tpu dc_solve): "
         f"{', '.join(f'{n}={v_dc[i]:.4f}' for i, n in enumerate(names))}",
         ".op"]))

    # 9. power amp closed-loop gain
    pa_solver = power_amp.make_params(88200.0)
    v_nl_pa = np.asarray(pa_solver.solver.v_nl_dc)
    g_pa = ac_gain(nlpa, v_nl_pa, [1000.0], "out")[0]
    write("tb_power_amp_gain.cir", netlist_to_cir(
        nlpa, "Class AB closed-loop gain",
        [f"* expected |H(1 kHz)| = {g_pa:.2f}x "
         f"({20*np.log10(g_pa):.2f} dB; feedback 1+15000/220 = 69.2x)",
         "VIN in 0 AC 1", ".ac lin 1 1000 1000", ".print ac v(out)"]))

    # 10. pickup time-varying RC (behavioral stage as a B-source deck)
    write("tb_pickup.cir", "\n".join([
        "* Electrostatic pickup: 1/(1-y) time-varying RC",
        "* (crates/openwurli-dsp/src/pickup.rs topology; our",
        "* openwurli_tpu/pickup.py is the bilinear discretisation)",
        "* expected: HPF corner 2312 Hz (tau = 287k x 240p);",
        "* output sensitivity 1.8375 V; H2 > H3 (asymmetric 1/(1-y))",
        "VY y 0 SIN(0 0.3 220)",
        "BC q 0 V = v(chg)*(1 - v(y))",
        "RQ chg q 287k",
        "CQ chg 0 240p",
        "* (simplified linearised deck; full behavior in pickup.py tests)",
        ".tran 10u 50m",
        ".end", ""]))

    # 11. pump family: shadow-pump step response
    write("tb_preamp_pump_transient.cir", netlist_to_cir(
        nlp_ac, "Tremolo pump: R_ldr step response (zero audio input)",
        ["* expected: OUT DC shifts with the fb divider as R_ldr steps;",
         "* pp pump bounded (~0.2 V at mid-R per cli pump-sweep; decays",
         "* with tau ~ Ce1*(R10+R_ldr))",
         "VIN in 0 DC 0", ".tran 0.1m 1.5", ".print tran v(out)"]))

    # 12. full chain: preamp -> 0.25 drive -> power amp
    chain = netlist_to_cir(nlp_ac, "chain-preamp", []).splitlines()
    chain = [l for l in chain if l not in (".end",)]
    pa_lines = netlist_to_cir(nlpa, "chain-pa", []).splitlines()[2:]
    pa_lines = [l for l in pa_lines if l != ".end"]
    renamed = []
    for l in pa_lines:
        parts = l.split()
        if parts and parts[0][0] in "RCQDV" and not l.startswith((".",)):
            parts = [parts[0] + "P"] + [
                ("pa_" + p if p not in ("0",) and not any(
                    c in p for c in "()=") and i in range(1, 4) else p)
                for i, p in enumerate(parts)][1:]
            renamed.append(" ".join([parts[0]] + parts[1:]))
        else:
            renamed.append(l)
    write("tb_full_chain.cir", "\n".join(
        chain
        + ["* drive: preamp out x 0.25 into the power amp input",
           "BDRV pa_in 0 V = 0.25*v(out)"]
        + renamed
        + ["* expected: end-to-end ~14 dB (preamp, tremolo off) + 36.8 dB",
           "* (power amp) - 12 dB drive = system gain before speaker",
           "VIN in 0 SIN(0 1m 1k)", ".tran 5u 30m", ".end", ""]))


if __name__ == "__main__":
    main()
