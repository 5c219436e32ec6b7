#!/bin/bash
# Second-stage oracle queue: waits for the first queue, then adjudicates
# the CT-mfn cell (+6.9 dB vs expected in the r4 sweep) the same way.
cd /root/repo
O=results_tpu_r5/oracle
while [ ! -f $O/queue_done.txt ]; do sleep 60; done
python tools/oracle_sweep.py ct mfn --niters 500 --size 256 --out $O > $O/log_ct_mfn.txt 2>&1
echo DONE > $O/queue2_done.txt
