#!/bin/bash
# r5 torch-oracle queue (VERDICT r4 #1): the three unadjudicated cells.
cd /root/repo
O=results_tpu_r5/oracle
python tools/oracle_sweep.py sisr mfn --niters 1000 --out $O > $O/log_sisr_mfn.txt 2>&1
python tools/oracle_sweep.py denoise wire --niters 1000 --out $O > $O/log_denoise_wire.txt 2>&1
python tools/oracle_sweep.py ct wire --niters 500 --size 256 --out $O > $O/log_ct_wire.txt 2>&1
echo DONE > $O/queue_done.txt
