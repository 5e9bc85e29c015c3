/* Golden-vector generator: includes the reference qpsk.c translation unit
 * (its pipeline functions are static) and drives TX/RX stage by stage with
 * deterministic bits, dumping raw vectors for the parity tests. */
#include <stddef.h>
#define main reference_main
#include "/root/reference/qpsk.c"
#undef main

#include <stdio.h>

#define GOLDEN_TX_FRAMES 20
#define SYMS_PER_TX (FRAME_SIZE / 2)

static uint32_t lcg_state = 0x12345678u;
static int lcg_bit(void) {
    /* deterministic replacement for rand()%2 */
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (int)((lcg_state >> 16) & 1u);
}

static void dump_f32(FILE *f, const float *p, size_t n) {
    fwrite(p, sizeof(float), n, f);
}

int main(void) {
    create_control_loop((TAU / 100.0f), -1.0f, 1.0f);
    rrc_make(FS, RS, .35f);

    /* --- filter impulse response (captures designed coeffs + GAIN) --- */
    {
        complex float mem[NTAPS];
        complex float sig[2 * NTAPS];
        for (int i = 0; i < NTAPS; i++) mem[i] = 0.0f;
        for (int i = 0; i < 2 * NTAPS; i++) sig[i] = 0.0f;
        sig[0] = 1.0f;
        rrc_fir(mem, sig, 2 * NTAPS);
        FILE *f = fopen("/tmp/golden/impulse.f32", "wb");
        for (int i = 0; i < 2 * NTAPS; i++) {
            float v[2] = {crealf(sig[i]), cimagf(sig[i])};
            dump_f32(f, v, 2);
        }
        fclose(f);
    }

    /* --- deterministic TX bits --- */
    static int bits[GOLDEN_TX_FRAMES][FRAME_SIZE];
    FILE *fb = fopen("/tmp/golden/bits.i32", "wb");
    for (int k = 0; k < GOLDEN_TX_FRAMES; k++) {
        for (int i = 0; i < FRAME_SIZE; i++) {
            bits[k][i] = lcg_bit();
            int32_t b = bits[k][i];
            fwrite(&b, sizeof b, 1, fb);
        }
    }
    fclose(fb);

    /* --- TX: 20 frames x 256 symbols at CENTER+50 --- */
    fbb_tx_phase = cmplx(0.0f);
    fbb_tx_rect = cmplx(TAU * (CENTER + 50.0) / FS);
    static int16_t pcm[GOLDEN_TX_FRAMES][FRAME_SIZE * 2];
    FILE *fp = fopen("/tmp/golden/pcm.i16", "wb");
    for (int k = 0; k < GOLDEN_TX_FRAMES; k++) {
        int length = qpsk_packet_mod(pcm[k], bits[k], SYMS_PER_TX);
        fwrite(pcm[k], sizeof(int16_t), length, fp);
    }
    fclose(fp);

    /* --- RX over the same samples, dumping per-frame stages --- */
    fbb_rx_phase = cmplx(0.0f);
    fbb_rx_rect = cmplxconj(TAU * CENTER / FS);
    FILE *fc = fopen("/tmp/golden/costas.f32", "wb");
    FILE *fd = fopen("/tmp/golden/decim.f32", "wb");
    FILE *ff = fopen("/tmp/golden/freq.f32", "wb");
    FILE *fi = fopen("/tmp/golden/filt.f32", "wb");
    const int16_t *all = &pcm[0][0];
    int nrx = GOLDEN_TX_FRAMES * 2;
    for (int k = 0; k < nrx; k++) {
        int16_t frame[FRAME_SIZE];
        for (int i = 0; i < FRAME_SIZE; i++) frame[i] = all[k * FRAME_SIZE + i];
        rx_frame(frame);
        for (int i = 0; i < FRAME_SIZE / CYCLES; i++) {
            float v[2] = {crealf(costas_frame[i]), cimagf(costas_frame[i])};
            dump_f32(fc, v, 2);
        }
        for (int i = 0; i < FRAME_SIZE / CYCLES; i++) {
            float v[2] = {crealf(decimated_frame[i]), cimagf(decimated_frame[i])};
            dump_f32(fd, v, 2);
        }
        /* input_frame holds the matched-filtered, mixed-down samples */
        for (int i = 0; i < FRAME_SIZE; i++) {
            float v[2] = {crealf(input_frame[i]), cimagf(input_frame[i])};
            dump_f32(fi, v, 2);
        }
        float fr[2] = {fbb_offset_freq, get_frequency()};
        dump_f32(ff, fr, 2);
    }
    fclose(fc); fclose(fd); fclose(ff); fclose(fi);
    fprintf(stderr, "golden vectors written to /tmp/golden\n");
    return 0;
}
