// Golden-generating driver over the REFERENCE decoder library.
//
// Builds against /root/reference/decoder (read-only); used by
// tests/test_golden_decode.py to produce 1-best references that
// aaltoasr_tpu.decoder must reproduce.  Mirrors the setup order of
// pyrectool/rectool.py:516-596 (get_toolbox) and the run loop of
// rectool.py:987-1043 (decode_utterance).
//
// Usage:
//   ref_decode_driver --ph model.ph [--dur model.dur] --lex lex.dict \
//     --arpa lm.arpa --lna utt.lna [--beam 280] [--token-limit 100000] \
//     [--lm-scale 30] [--dur-scale 3] [--trans-scale 1] \
//     [--lookahead lm2.arpa] [--no-crossword] [--insertion-penalty 0]
//
// Prints the best LM history (one line of words) to stdout.

#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>

#include "Toolbox.hh"

int main(int argc, char **argv) {
  const char *ph = nullptr, *dur = nullptr, *lex = nullptr;
  const char *arpa = nullptr, *lna = nullptr, *lookahead = nullptr;
  const char *stateseg = nullptr, *wordgraph = nullptr;
  const char *nbest = nullptr;
  const char *word_boundary = nullptr;
  float beam = 280, lm_scale = 30, dur_scale = 3, trans_scale = 1;
  float we_beam = -1;  // default: 2*beam/3 (rectool.py-style)
  float insertion_penalty = 0;
  int token_limit = 100000;
  int la_mode = 1;  // reference lm_lookahead: 1 bigram, 2 trigram
  bool split_multiwords = false;
  bool crossword = true;
  bool require_end = true;
  bool print_scores = false;
  bool oss = true;
  bool silence_is_word = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() { return argv[++i]; };
    if (a == "--ph") ph = next();
    else if (a == "--dur") dur = next();
    else if (a == "--lex") lex = next();
    else if (a == "--arpa") arpa = next();
    else if (a == "--lna") lna = next();
    else if (a == "--lookahead") lookahead = next();
    else if (a == "--beam") beam = atof(next());
    else if (a == "--we-beam") we_beam = atof(next());
    else if (a == "--token-limit") token_limit = atoi(next());
    else if (a == "--lm-scale") lm_scale = atof(next());
    else if (a == "--dur-scale") dur_scale = atof(next());
    else if (a == "--trans-scale") trans_scale = atof(next());
    else if (a == "--insertion-penalty") insertion_penalty = atof(next());
    else if (a == "--stateseg") stateseg = next();
    else if (a == "--wordgraph") wordgraph = next();
    else if (a == "--nbest") nbest = next();
    else if (a == "--la-mode") la_mode = atoi(next());
    else if (a == "--split-multiwords") split_multiwords = true;
    else if (a == "--no-crossword") crossword = false;
    else if (a == "--no-oss") oss = false;
    else if (a == "--no-require-end") require_end = false;
    else if (a == "--print-scores") print_scores = true;
    else if (a == "--word-boundary") word_boundary = next();
    else if (a == "--silence-is-word") silence_is_word = true;
    else { fprintf(stderr, "unknown arg %s\n", a.c_str()); return 2; }
  }
  if (!ph || !lex || !arpa || !lna) {
    fprintf(stderr, "need --ph --lex --arpa --lna\n");
    return 2;
  }

  Toolbox t(ph, dur);
  t.set_silence_is_word(silence_is_word ? 1 : 0);
  t.set_optional_short_silence(oss);
  t.set_cross_word_triphones(crossword);
  t.set_require_sentence_end(require_end);
  t.set_verbose(0);
  t.set_print_text_result(0);
  t.set_print_probs(0);
  t.set_global_beam(beam);
  t.set_word_end_beam(we_beam >= 0 ? we_beam : 2 * beam / 3);
  t.set_token_limit(token_limit);
  t.set_prune_similar(3);
  t.set_duration_scale(dur_scale);
  t.set_transition_scale(trans_scale);
  t.set_lm_scale(lm_scale);
  t.set_insertion_penalty(insertion_penalty);
  t.set_lm_lookahead(lookahead != nullptr ? la_mode : 0);
  if (word_boundary) t.set_word_boundary(word_boundary);
  t.lex_read(lex);
  t.set_sentence_boundary("<s>", "</s>");
  t.ngram_read(arpa, /*binary=*/false, /*quiet=*/true);
  if (lookahead) {
    t.read_lookahead_ngram(lookahead, /*binary=*/false, /*quiet=*/true);
    t.prune_lm_lookahead_buffers(0, 4);
  }
  t.set_use_word_pair_approximation(true);

  if (split_multiwords) t.set_split_multiwords(true);
  if (stateseg) t.set_keep_state_segmentation(1);
  if (wordgraph || nbest) t.set_generate_word_graph(true);

  t.lna_open(lna, 1024);
  t.reset(0);
  t.set_end(-1);
  int frames = 0;
  while (t.run()) ++frames;
  t.print_best_lm_history(stdout);
  if (stateseg) t.write_state_segmentation(stateseg);
  if (wordgraph) t.write_word_graph(wordgraph);
  if (nbest) t.write_word_history(nbest);
  if (print_scores) {
    // score breakdown of the winning token (total includes the
    // sentence-end update when require_end is on)
    const Token &best =
      t.tp_search().get_best_final_token();
    fprintf(stderr, "scores total=%.4f am=%.4f lm=%.4f\n",
            best.total_log_prob, best.am_log_prob, best.lm_log_prob);
  }
  fprintf(stderr, "frames=%d\n", frames);
  return 0;
}
