// Golden-generating driver over the REFERENCE FstSearch decoder
// (decoder/src/FstSearch.hh + FstSearch_tmpl.hh).
//
// Used by tests/test_golden_fst.py to produce 1-best + logprob (and
// FstConfidence values) that aaltoasr_tpu.decoder.fstsearch's
// MitFstSearch must reproduce on the same search FST + LNA.
//
// Usage:
//   ref_fst_driver --fst final.fst --ph model.ph [--dur model.dur] \
//     --lna utt.lna [--beam 1e9] [--token-limit 100000] \
//     [--dur-scale 0] [--trans-scale 1] [--confidence]
//
// Prints "<words>" then "logprob=..." (and with --confidence the
// token/best-acu confidence parts) to stdout.

#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>

#include "FstSearch.hh"
#include "FstConfidence.hh"

int main(int argc, char **argv) {
  const char *fst = nullptr, *ph = nullptr, *dur = nullptr;
  const char *lna = nullptr;
  float beam = 1e9f, dur_scale = 0.0f, trans_scale = 1.0f;
  int token_limit = 100000;
  bool confidence = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() { return argv[++i]; };
    if (a == "--fst") fst = next();
    else if (a == "--ph") ph = next();
    else if (a == "--dur") dur = next();
    else if (a == "--lna") lna = next();
    else if (a == "--beam") beam = atof(next());
    else if (a == "--token-limit") token_limit = atoi(next());
    else if (a == "--dur-scale") dur_scale = atof(next());
    else if (a == "--trans-scale") trans_scale = atof(next());
    else if (a == "--confidence") confidence = true;
    else { fprintf(stderr, "unknown arg %s\n", a.c_str()); return 2; }
  }
  if (!fst || !ph || !lna) {
    fprintf(stderr, "need --fst --ph --lna\n");
    return 2;
  }

  if (confidence) {
    FstConfidence fc(fst, ph, dur);
    fc.set_beam(beam);
    fc.set_token_limit(token_limit);
    fc.set_duration_scale(dur_scale);
    fc.set_transition_scale(trans_scale);
    fc.init_search();
    fc.lna_open(lna, 1024);
    fc.run();
    float conf = 0.0f, gt = 0.0f, ba = 0.0f;
    std::string res = fc.result_and_confidence(&conf);
    float lp = fc.get_best_final_token_logprob();
    printf("%s\n", res.c_str());
    printf("logprob=%.4f\n", lp);
    // the two halves (FstConfidence.cc:8-78); result_and_confidence
    // averaged them, recover via a second call to the internals is
    // not public -- print the average only
    (void)gt; (void)ba;
    printf("confidence=%.6f\n", conf);
    return 0;
  }

  FstSearch s(fst, ph, dur);
  s.set_beam(beam);
  s.set_token_limit(token_limit);
  s.set_duration_scale(dur_scale);
  s.set_transition_scale(trans_scale);
  s.init_search();
  s.lna_open(lna, 1024);
  s.run();
  float lp = 0.0f;
  std::string res = s.get_result_and_logprob(lp);
  printf("%s\n", res.c_str());
  printf("logprob=%.4f\n", lp);
  return 0;
}
