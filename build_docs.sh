#!/bin/sh
# Generate API documentation (the reference ships a pdoc->pandoc PDF,
# build_docs.sh:1-2; here: pdoc if available, else stdlib pydoc — BOTH a
# rendered HTML tree (docs/html/) and plain-text dumps (docs/api/)).
set -e
cd "$(dirname "$0")"
mkdir -p docs/api docs/html

MODULES="odelib_tpu odelib_tpu.api odelib_tpu.distributions \
 odelib_tpu.stats odelib_tpu.model odelib_tpu.data \
 odelib_tpu.native odelib_tpu.ops.integrate \
 odelib_tpu.ops.runge_kutta odelib_tpu.ops.pallas_mh \
 odelib_tpu.ops.pallas_joint odelib_tpu.ops.pallas_pt \
 odelib_tpu.ops.pallas_pf \
 odelib_tpu.ops.schedule \
 odelib_tpu.ops.sde odelib_tpu.samplers.pf \
 odelib_tpu.samplers.lhs odelib_tpu.samplers.mh \
 odelib_tpu.samplers.hmc odelib_tpu.samplers.pt \
 odelib_tpu.samplers.ensemble odelib_tpu.samplers.amh \
 odelib_tpu.samplers.smc odelib_tpu.samplers.optimize \
 odelib_tpu.samplers.advi odelib_tpu.samplers.joint odelib_tpu.joint \
 odelib_tpu.api_inference odelib_tpu.dispatch \
 odelib_tpu.models odelib_tpu.models.base \
 odelib_tpu.models.infection odelib_tpu.models.ecology \
 odelib_tpu.models.epidemiology odelib_tpu.models.chemistry \
 odelib_tpu.models.pharmacology odelib_tpu.models.neuroscience \
 odelib_tpu.parallel.mesh odelib_tpu.utils.checkpoint \
 odelib_tpu.utils.profiling odelib_tpu.utils.diagnostics \
 odelib_tpu.utils.sbc \
 odelib_tpu.utils.model_comparison odelib_tpu.utils.sensitivity"

if python -c "import pdoc" 2>/dev/null; then
    python -m pdoc -o docs/html odelib_tpu
else
    for m in $MODULES; do
        python -m pydoc "$m" > "docs/api/${m}.txt" || true
    done
    python docs/make_html.py $MODULES
fi
echo "docs written to docs/api/ (text) and docs/html/ (rendered)"
