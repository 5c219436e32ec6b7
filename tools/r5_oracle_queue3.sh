#!/bin/bash
# Third-stage r5 oracle queue: waits for the in-flight CT torch runs
# (wire pid $1, mfn pid $2) and the 512^3 occupancy TPU run (pid $3),
# then adjudicates the CT cells on TPU (jax_only from the saved inits)
# and launches the SISR siren/gauss torch cells (the +10.4/+8.7 dB
# sweep-vs-expected outliers) in parallel at 1000 iters.
set -u
O=results_tpu_r5/oracle
for pid in "$@"; do
  while kill -0 "$pid" 2>/dev/null; do sleep 20; done
done
python tools/oracle_sweep.py ct wire --niters 150 --size 256 --jax_only \
  --out $O >> $O/log_ct_wire.txt 2>&1
python tools/oracle_sweep.py ct mfn --niters 150 --size 256 --jax_only \
  --out $O >> $O/log_ct_mfn.txt 2>&1
echo "CT cells adjudicated" >> $O/queue.log
OMP_NUM_THREADS=1 python tools/oracle_sweep.py sisr siren --niters 1000 \
  --out $O > $O/log_sisr_siren.txt 2>&1 &
P1=$!
OMP_NUM_THREADS=1 python tools/oracle_sweep.py sisr gauss --niters 1000 \
  --out $O > $O/log_sisr_gauss.txt 2>&1 &
P2=$!
wait $P1 $P2
python tools/oracle_sweep.py sisr siren --niters 1000 --jax_only \
  --out $O >> $O/log_sisr_siren.txt 2>&1
python tools/oracle_sweep.py sisr gauss --niters 1000 --jax_only \
  --out $O >> $O/log_sisr_gauss.txt 2>&1
echo "SISR siren+gauss cells adjudicated" >> $O/queue.log
